"""t-digest-style mergeable quantile sketch — a custom distributed
aggregator built from Arrow-batched pandas stages.

Spark ships GK-based ``approx_percentile`` and this engine carries exact
tiers (distinct-value grids, histogram refinement); this operator exists
for the case neither covers well: a REUSABLE, mergeable summary object —
compute once per partition/day/source, store ~100 centroids, merge
arbitrary subsets later and read any quantile — with the t-digest
property that accuracy CONCENTRATES AT THE TAILS (centroid capacity
∝ q(1−q), so p99/p999 stay sharp where an equi-weight histogram smears).

Dataflow (Dunning & Ertl's merging digest, arXiv:1902.04023, re-expressed
as DataFrame stages):

1. partition sketch — ``mapInPandas``: sort the partition's values, merge
   left-to-right into centroids capped by the k1 scale function
   (≤ ``max_centroids`` per partition);
2. tree merge — centroids are tiny rows (mean, weight); a salted
   ``applyInPandas`` level bounds any single merge's input, then one
   final merge produces the corpus digest (both re-run the same
   deterministic sorted-merge compression);
3. quantile read — midpoint-rule interpolation over cumulative centroid
   weights, driver-free until the k requested quantiles.

Determinism: every compression sorts its input by (mean, weight) first,
so the result depends only on the multiset of inputs per merge group —
stable across runs on a fixed layout. Accuracy (rank error ≤ ~1/δ,
tail-weighted) is pinned in pytest against the exact percentile tier;
the registered query is rows-only by construction (sketch ≠ SQL).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CENTROID_SCHEMA = "mean double, weight long"


def _k1(q: float, delta: int) -> float:
    """t-digest k1 scale: k(q) = δ/(2π)·asin(2q−1) — tail-compressing."""
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * q - 1.0)


def _compress(means: np.ndarray, weights: np.ndarray, max_centroids: int):
    """Greedy sorted merge under the k1 BOUNDARY condition: a cluster may
    absorb the next point only while k(q_right) − k(q_left) ≤ 1, which
    bounds the output at ~δ centroids independent of n (a weight-cap
    formulation instead grows with ln n — measured 468 centroids at
    δ=100 on the 60k fixture; this form yields ≤ δ)."""
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = int(weights.sum())
    if total == 0:
        return np.empty(0), np.empty(0, dtype=np.int64)
    out_m: list[float] = []
    out_w: list[int] = []
    acc_m, acc_w = float(means[0]), int(weights[0])
    cum = 0  # weight fully emitted so far
    k_left = _k1(0.0, max_centroids)
    for m, w in zip(means[1:], weights[1:]):
        q_right = (cum + acc_w + int(w)) / total
        if _k1(q_right, max_centroids) - k_left <= 1.0:
            acc_m += (float(m) - acc_m) * (w / (acc_w + w))
            acc_w += int(w)
        else:
            out_m.append(acc_m)
            out_w.append(acc_w)
            cum += acc_w
            k_left = _k1(cum / total, max_centroids)
            acc_m, acc_w = float(m), int(w)
    out_m.append(acc_m)
    out_w.append(acc_w)
    return np.asarray(out_m), np.asarray(out_w, dtype=np.int64)


def tdigest_sketch(
    df: DataFrame, col: str, max_centroids: int = 100, merge_fanin: int = 16
) -> DataFrame:
    """Corpus-level digest as a ``(mean, weight)`` centroid DataFrame."""

    def part_sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vals = []
        for pdf in batches:
            v = pdf[col].to_numpy(dtype=np.float64)
            vals.append(v[~np.isnan(v)])
        if not vals:
            return
        v = np.concatenate(vals)
        if v.size == 0:
            return
        m, w = _compress(v, np.ones(v.size, dtype=np.int64), max_centroids)
        yield pd.DataFrame({"mean": m, "weight": w})

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _compress(
            pdf["mean"].to_numpy(np.float64),
            pdf["weight"].to_numpy(np.int64),
            max_centroids,
        )
        return pd.DataFrame({"mean": m, "weight": w})

    parts = df.select(F.col(col).cast("double").alias(col)).mapInPandas(
        part_sketch, _CENTROID_SCHEMA
    )
    # deterministic salt: hash of the centroid mean — groups any fixed
    # centroid multiset identically regardless of upstream layout
    salted = parts.withColumn(
        "g", F.pmod(F.xxhash64(F.col("mean")), F.lit(merge_fanin))
    )
    level1 = salted.groupBy("g").applyInPandas(
        lambda pdf: merge_group(pdf[["mean", "weight"]]), _CENTROID_SCHEMA
    )
    return level1.groupBy(F.lit(1).alias("_k")).applyInPandas(
        lambda pdf: merge_group(pdf[["mean", "weight"]]), _CENTROID_SCHEMA
    )


def tdigest_merge(*digests: DataFrame, max_centroids: int = 100) -> DataFrame:
    """Merge stored digests (the store-per-day/per-source use case): union
    the centroid sets — weights carry — and re-compress once. Associative
    and commutative up to compression, like the reference's posting-list
    union (src/main.cpp:119-128)."""
    import functools

    allc = functools.reduce(lambda a, b: a.unionByName(b), digests)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = _compress(
            pdf["mean"].to_numpy(np.float64),
            pdf["weight"].to_numpy(np.int64),
            max_centroids,
        )
        return pd.DataFrame({"mean": m, "weight": w})

    return allc.groupBy(F.lit(1).alias("_k")).applyInPandas(
        lambda pdf: merge_group(pdf[["mean", "weight"]]), _CENTROID_SCHEMA
    )


def tdigest_quantiles(digest: DataFrame, qs: list[float]) -> DataFrame:
    """Read quantiles from a digest via midpoint-rule interpolation."""
    spark = digest.sparkSession
    pdf = digest.orderBy("mean").toPandas()  # ~max_centroids rows by contract
    m = pdf["mean"].to_numpy(np.float64)
    w = pdf["weight"].to_numpy(np.float64)
    total = w.sum()
    if m.size == 0 or total <= 0:
        # empty digest (all-NULL/empty input column): NULL estimates rather
        # than an IndexError on cum[0]
        return spark.createDataFrame(
            [(float(q), None) for q in qs], "q double, estimate double"
        )
    # centroid midpoints in cumulative-weight space
    cum = np.cumsum(w) - w / 2
    rows = []
    for q in qs:
        target = q * total
        if target <= cum[0]:
            est = m[0]
        elif target >= cum[-1]:
            est = m[-1]
        else:
            est = float(np.interp(target, cum, m))
        rows.append((float(q), est))
    return spark.createDataFrame(rows, "q double, estimate double")


def tdigest_by_key(
    df: DataFrame, key: str, col: str, max_centroids: int = 100
) -> DataFrame:
    """Per-key digests: ``(key, mean, weight)`` — the store-per-group form
    (one digest row-set per day/source/experiment arm, merged later with
    ``tdigest_merge``). One shuffle on the key; each group sketches its
    values in a single Arrow pass."""

    def sketch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        m, w = _compress(v, np.ones(v.size, dtype=np.int64), max_centroids)
        return pd.DataFrame({key: pdf[key].iloc[0], "mean": m, "weight": w})

    return (
        df.select(key, F.col(col).cast("double").alias(col))
        .groupBy(key)
        .applyInPandas(sketch_group, f"{key} string, mean double, weight long")
    )
