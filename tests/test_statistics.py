"""Numerical pins for the statistics family's shared SQL fragments.

These exist because the oracle-parity hash gate runs the SAME fragment on
both engines: a formula bug that is consistent across Spark and DuckDB is
invisible to it (round-5 advisor finding: _BH_P_SQL computed erf, i.e.
1 - p, instead of the two-sided p = erfc — inverting the entire BH
ranking while every hash matched).  The pins below check the fragment
against an independent reference (math.erfc), not against itself.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_paradigm_spark.queries.statistics import _BH_P_SQL

from .conftest import SF_SMOKE


def _pvals(spark, zvals):
    """Evaluate the shared fragment through Spark SQL (the real code path)."""
    df = spark.createDataFrame([(float(z),) for z in zvals], "zval double")
    rows = (
        df.select(
            "zval",
            (F.abs("zval") / F.sqrt(F.lit(2.0))).alias("zz"),
            (1.0 / (1.0 + 0.3275911 * F.abs("zval") / F.sqrt(F.lit(2.0)))).alias("tt"),
        )
        .select("zval", F.expr(_BH_P_SQL).alias("pval"))
        .orderBy("zval")
        .collect()
    )
    return {r.zval: r.pval for r in rows}


def test_bh_p_fragment_is_two_sided_p_not_its_complement(spark):
    zs = [0.0, 0.5, 1.0, 1.645, 1.96, 2.576, 3.0, 4.0]
    got = _pvals(spark, zs)
    for z in zs:
        want = math.erfc(abs(z) / math.sqrt(2.0))  # exact two-sided p
        # A&S 7.1.26 polynomial: |erf error| <= 1.5e-7
        assert abs(got[z] - want) < 5e-7, (z, got[z], want)
    # the textbook anchors the advisor asked for
    assert abs(got[1.96] - 0.05) < 1e-3
    assert abs(got[1.645] - 0.10) < 1e-3
    assert abs(got[0.0] - 1.0) < 1e-6
    # monotone DECREASING in |z| (the buggy fragment was increasing)
    ordered = [got[z] for z in zs]
    assert all(a > b for a, b in zip(ordered, ordered[1:]))


def test_bh_fdr_rank_one_is_most_extreme_z(spark):
    """End-to-end: the smallest-p (rank 1) nation must carry the largest |z|.

    Under the inverted fragment rank 1 went to the LEAST deviant nation."""
    from mapreduce_paradigm_spark.registry import all_specs

    df = all_specs()["nation_balance_bh_fdr"].builder(spark, SF_SMOKE)
    rows = df.orderBy("rnk").collect()
    assert rows, "query returned no rows"
    zmax = max(abs(r.z) for r in rows)
    assert abs(rows[0].z) == zmax
    # p monotone non-decreasing in rank, p_adj >= p, p_adj monotone
    ps = [r.p for r in rows]
    assert ps == sorted(ps)
    for r in rows:
        assert r.p_adj >= r.p - 1e-9
    padjs = [r.p_adj for r in rows]
    assert padjs == sorted(padjs)
