"""Isotonic (PAV) score calibration — FITTING, not just diagnosis.

`label_score_calibration` (queries/mlprep.py) reads how mis-calibrated a
score column is; this operator produces the monotone correction itself:
the pool-adjacent-violators solution to

    min Σ w_s (g(s) − y_s)²   s.t.  g non-decreasing,

the standard way to turn a ranking-quality classifier score into a usable
acceptance probability (Zadrozny & Elkan 2002). PAV is inherently
sequential over the sorted score axis, so the distributed shape is the
grouped-selection contract used across this engine: ONE shuffle reduces
the corpus to per-distinct-(gridded)-score counts, the driver runs PAV
over that bounded axis (O(grid cardinality), NEVER O(rows) — the grid
rounding is what makes the driver contract explicit), and the fitted
step function returns as a plan-side frame callers broadcast-join back
onto row-scale data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    grid: int = 10000,
) -> DataFrame:
    """``(sm, n, n_pos, rate_raw, rate_iso)`` per distinct gridded score:
    ``sm`` is the score rounded to 1/``grid`` (exact integer key), rates
    are exact integer ratios rounded 6dp — rerun- and engine-stable.

    The PAV pass is the textbook stack algorithm over integer (n, n_pos)
    pool sums: a pool's fitted rate is an exact ratio, pools merge while
    the rate sequence decreases, and the fitted value is constant within
    each pool — monotonicity and weighted-mean preservation are pinned in
    pytest against a brute-force numpy PAV.
    """
    spark = df.sparkSession
    sm = F.round(F.col(score_col).cast("double") * grid, 0).cast("long")
    agg = (
        df.select(sm.alias("sm"), F.col(label_col).cast("long").alias("y"))
        .groupBy("sm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )
    # driver sees O(grid cardinality) rows — the documented bound; sorted
    # ascending so PAV's sequential order is deterministic
    rows = sorted(agg.collect(), key=lambda r: r["sm"])
    if not rows:
        return spark.createDataFrame(
            [], "sm BIGINT, n BIGINT, n_pos BIGINT, rate_raw DOUBLE, rate_iso DOUBLE"
        )
    # PAV: pools carry exact integer (n, n_pos); violation test compares
    # exact cross-multiplied integers (no float in the merge decision)
    pools: list[list] = []  # [n, n_pos, count_of_points]
    for r in rows:
        pools.append([r["n"], r["n_pos"], 1])
        while (
            len(pools) >= 2
            and pools[-2][1] * pools[-1][0] > pools[-1][1] * pools[-2][0]
        ):
            b = pools.pop()
            pools[-1][0] += b[0]
            pools[-1][1] += b[1]
            pools[-1][2] += b[2]
    fitted = []
    i = 0
    for n_pool, pos_pool, cnt in pools:
        for _ in range(cnt):
            r = rows[i]
            fitted.append(
                (
                    r["sm"],
                    r["n"],
                    r["n_pos"],
                    round(r["n_pos"] / r["n"], 6),
                    round(pos_pool / n_pool, 6),
                )
            )
            i += 1
    return spark.createDataFrame(
        fitted, "sm BIGINT, n BIGINT, n_pos BIGINT, rate_raw DOUBLE, rate_iso DOUBLE"
    )
