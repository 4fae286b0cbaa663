"""Mathematical invariants of the drift/divergence family — properties the
DuckDB parity gate cannot check (it proves Spark == DuckDB, not that either
is a valid instance of the statistic)."""

from __future__ import annotations

import math

from mapreduce_paradigm_spark.registry import all_specs

from .conftest import SF_CORRECT


def _one(spark, name):
    [row] = all_specs()[name].builder(spark, SF_CORRECT).collect()
    return row


def test_psi_nonnegative_and_totals_consistent(spark):
    rows = all_specs()["events_value_psi_drift"].builder(spark, SF_CORRECT).collect()
    # Gibbs: every (p-q)ln(p/q) term is >= 0, so the rounded terms are >= -1 micro
    assert all(r["psi_term"] >= -1e-6 for r in rows)
    total = rows[0]["psi_total"]
    assert all(abs(r["psi_total"] - total) < 1e-12 for r in rows)
    assert abs(total - sum(r["psi_term"] for r in rows)) < 1e-6 * len(rows)


def test_wasserstein_bounds(spark):
    r = _one(spark, "events_value_wasserstein_drift")
    # W1 >= 0 and cannot exceed the value range (~[0.01, 490])
    assert 0 <= r["w1_dist"] <= 500


def test_js_divergence_bounds(spark):
    rows = all_specs()["source_unigram_js_divergence"].builder(spark, SF_CORRECT).collect()
    ln2 = math.log(2)
    assert rows and all(-1e-6 <= r["js_div"] <= ln2 + 1e-6 for r in rows)
    # symmetric-by-construction: each unordered pair appears exactly once
    pairs = {(r["source_a"], r["source_b"]) for r in rows}
    assert len(pairs) == len(rows) == 190  # C(20,2)
    assert all(a < b for a, b in pairs)


def test_rank_and_variance_stats_nonnegative(spark):
    assert _one(spark, "qty_kruskal_wallis_h")["h_stat"] >= 0
    assert _one(spark, "qty_brown_forsythe")["f_stat"] >= 0
    r = _one(spark, "qty_flag_mutual_information")
    assert r["mi"] >= -1e-6 and r["h_flag"] > 0 and r["h_bin"] > 0
    assert -1e-6 <= r["nmi"] <= 1 + 1e-6
    v = _one(spark, "priority_status_cramers_v")
    assert -1e-6 <= v["cramers_v"] <= 1 + 1e-6


def test_cvar_dominates_var(spark):
    r = _one(spark, "order_value_cvar95")
    # expected shortfall is at least the VaR cut, and the tail is ~5%
    assert r["cvar95"] >= r["var95"]
    assert 0.04 <= r["n_tail"] / r["n"] <= 0.06


def test_cuped_reduction_matches_r2_identity(spark):
    r = _one(spark, "user_value_cuped")
    # var_adj = var_y (1 - r²) — the defining identity, within rounding
    assert 0 <= r["var_reduction"] <= 1
    assert abs(r["var_y_adj_t2"] - r["var_y_t2"] * (1 - r["var_reduction"])) < max(
        1e-4 * r["var_y_t2"], 1e-4
    )


def test_holt_winters_seasonals_near_zero_mean(spark):
    # additive-seasonal convention: forecast = level + trend + head seasonal;
    # level must sit inside the observed count range (sanity of the fold)
    r = _one(spark, "hourly_counts_holt_winters")
    assert 0 < r["level"] < 1000
    assert abs(r["forecast_next"] - (r["level"] + r["trend"])) < 200


def test_dw_in_range_and_jb_nonnegative(spark):
    assert 0 <= _one(spark, "hourly_value_durbin_watson")["dw"] <= 4
    jb = _one(spark, "value_jarque_bera")
    assert jb["jb_stat"] >= 0
    assert _one(spark, "hourly_value_breusch_pagan")["bp_lm"] >= 0


def test_period24_share_in_unit_interval(spark):
    r = _one(spark, "hourly_counts_period24_power")
    assert -1e-6 <= r["period24_share"] <= 1 + 1e-6
