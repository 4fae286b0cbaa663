"""Exact distributed order statistics via iterative histogram refinement.

``percentile`` / sort-based medians hold per-group value buffers (exact but
memory-bound) and a global sort is a full shuffle. This operator finds the
EXACT k-th smallest of an integer-valued column in O(log_B(range)) passes:
each pass histograms the remaining candidate range into B buckets, the
driver receives only B counts, picks the bucket containing rank k, and
narrows. For 64-bit micro-unit ranges (~10^12) and B=1024, three passes
settle any rank — each pass one scan + one tiny aggregate, no shuffle of
data rows, no driver-side values beyond B counts. This is the classic
"median of a terabyte" construction (distributed selection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kth_smallest_long(df: DataFrame, col: str, k: int, buckets: int = 1024) -> int:
    """Exact k-th smallest (1-based) of a LONG column. Driver work per
    pass: ``buckets`` counts; passes: ceil(log_buckets(range))."""
    lo_hi = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None:
        raise ValueError("kth_smallest_long on empty input")
    remaining_k = k
    while lo < hi:
        # bucket width >= 1 so the range strictly narrows every pass
        width = max(1, (hi - lo) // buckets + 1)
        c = F.col(col)
        hist = (
            df.filter((c >= lo) & (c <= hi))
            .groupBy(((c - F.lit(lo)) / F.lit(width)).cast("long").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        counts = {r["b"]: r["n"] for r in hist}
        acc = 0
        for b in sorted(counts):
            if acc + counts[b] >= remaining_k:
                remaining_k -= acc
                lo2 = lo + b * width
                hi2 = min(hi, lo2 + width - 1)
                lo, hi = lo2, hi2
                break
            acc += counts[b]
        else:  # pragma: no cover - rank beyond row count
            raise ValueError("rank exceeds row count in range")
    return lo


def exact_median_long(df: DataFrame, col: str, buckets: int = 1024) -> float:
    """Exact median of a LONG column: both middle order statistics via the
    histogram-refinement selection, averaged for even counts. Equivalent to
    ``percentile(col, 0.5)`` without per-group buffers or a global sort."""
    n = df.filter(F.col(col).isNotNull()).count()
    if n == 0:
        raise ValueError("exact_median_long on empty input")
    k1 = (n + 1) // 2
    k2 = n // 2 + 1
    v1 = kth_smallest_long(df, col, k1, buckets)
    v2 = v1 if k2 == k1 else kth_smallest_long(df, col, k2, buckets)
    return (v1 + v2) / 2
