"""As-of join — an operator Spark lacks natively, composed from built-ins.

Semantics: for each left row, attach the most recent right row with
``right.ts < left.ts`` (strict) within the same partition key — the standard
time-series "last known value" join (cf. the reference's absence of any join,
SURVEY.md §2.B, and the DuckDB/kdb ASOF JOIN).

Spark-first realization: union the two tagged streams, then one window pass
per partition key ordered by (ts, tag) with ``last(value, ignorenulls=True)``
over an unbounded-preceding frame. This is a single shuffle on the partition
key — no nested-loop range join, no per-row subquery — and scales to
arbitrarily large sides (state is one row per window position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Return ``left`` plus, for each value column ``v`` of ``right``,
    ``asof_<v>`` = value from the latest strictly-earlier right row.

    Strictness: left rows sort before right rows at equal timestamps
    (tag 0 < 1), so a right row at exactly ``left.ts`` is NOT visible.
    """
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    ).select(*lcols, "__ts", "__tag", *[f"__v_{v}" for v in value_cols])

    # Third order key: the right row's value tuple. Without it, several
    # right rows sharing (key, ts) sort arbitrarily and last() would pick a
    # shuffle-dependent winner; with it, the GREATEST value tuple wins,
    # deterministically across runs and cluster layouts. (Left rows carry
    # NULL, which sorts first within their (ts, tag) group — harmless, as
    # only right rows feed last(ignorenulls).)
    tb = F.struct(*[F.col(f"__v_{v}") for v in value_cols]).alias("__tb")
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.asc("__tag"), F.asc("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Note: at a left row (tag 0), the frame holds all right rows with
    # ts < left.ts, plus same-ts left rows — never same-ts right rows.
    picked = l.unionByName(r).withColumn("__tb", tb)
    for v in value_cols:
        picked = picked.withColumn(f"asof_{v}", F.last(f"__v_{v}", ignorenulls=True).over(w))
    return picked.filter(F.col("__tag") == 0).select(
        *lcols, *[f"asof_{v}" for v in value_cols]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int,
) -> DataFrame:
    """Nearest-as-of join: for each left row, the right row minimizing
    |right.ts − left.ts| within ``tolerance_seconds``; ties prefer the
    BACKWARD (earlier-or-equal) candidate, then the greatest value tuple
    (same determinism rule as ``asof_join``). NULLs when no candidate is
    inside the tolerance.

    Direction semantics: backward candidates are non-strict (a right row
    at exactly left.ts matches, Δ=0), forward candidates strict — so an
    equal-timestamp right row is considered once, as backward.

    Shape: the backward and forward candidates are BOTH computed as window
    passes over one key-partitioned tagged union — two sorts sharing a
    single shuffle (same partitionBy keys ⇒ exchange reuse), no range
    self-join and no rejoin at all; the tolerance filter and the |Δ| argmin
    are row-local. (Earlier revisions rejoined separate backward/forward
    passes on the full left row tuple, which silently dropped left rows
    containing NULLs and cross-paired duplicate left rows; computing both
    passes over the same rows eliminates that hazard structurally.)"""
    lcols = list(left.columns)
    vts = ["__rts", *value_cols]

    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[
            F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}")
            for v in value_cols
        ],
    )
    r = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on
        ],
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.col(right_ts).alias("__rts"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    ).select(*lcols, "__ts", "__tag", "__rts", *[f"__v_{v}" for v in value_cols])
    u = l.unionByName(r)

    tb = F.struct(*[F.col(f"__v_{v}") for v in value_cols])

    # backward (non-strict): rights (tag 1) sort BEFORE lefts (tag 0) at
    # equal ts — tag DESC; ties among same-ts rights resolved by greatest
    # value tuple (tb asc + last())
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.desc("__tag"), F.asc(tb))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward (strict): lefts sort BEFORE rights at equal ts (tag ASC),
    # time DESC — an equal-ts right row is never a forward candidate
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.desc("__ts"), F.asc("__tag"), F.asc(tb))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = u
    for v in vts:
        src = f"__v_{v}" if v != "__rts" else "__rts"
        j = j.withColumn(f"__bk_{v}", F.last(src, ignorenulls=True).over(wb))
        j = j.withColumn(f"__fw_{v}", F.last(src, ignorenulls=True).over(wf))
    j = j.filter(F.col("__tag") == 0)
    bd = F.unix_micros(F.col("__ts").cast("timestamp")) - F.unix_micros(
        F.col("__bk___rts").cast("timestamp")
    )
    fd = F.unix_micros(F.col("__fw___rts").cast("timestamp")) - F.unix_micros(
        F.col("__ts").cast("timestamp")
    )
    tol = F.lit(int(tolerance_seconds) * 1_000_000)
    b_ok = F.col("__bk___rts").isNotNull() & (bd <= tol)
    f_ok = F.col("__fw___rts").isNotNull() & (fd <= tol)
    use_back = b_ok & (~f_ok | (bd <= fd))
    out = j
    for v in value_cols:
        out = out.withColumn(
            f"asof_{v}",
            F.when(use_back, F.col(f"__bk_{v}"))
            .when(f_ok, F.col(f"__fw_{v}"))
            .otherwise(F.lit(None).cast(right.schema[v].dataType)),
        )
    return out.select(*lcols, *[f"asof_{v}" for v in value_cols])
