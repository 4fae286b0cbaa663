"""Property pins for the round-5 curation / preference families — the
invariants the value-hash oracles cannot state directly (subset/containment
structure, convergence quality, planted-order recovery)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paradigm_spark.registry import all_specs
from mapreduce_paradigm_spark.sources.tables import load_table

from .conftest import SF_CORRECT


def _run(spark, name):
    return all_specs()[name].builder(spark, SF_CORRECT)


def test_boilerplate_clean_text_is_subsequence(spark):
    """clean_text must be the original token stream with whole segments
    removed — counts add up, and a doc with nothing flagged reassembles
    to its (normalized) original text."""
    out = _run(spark, "doc_segment_boilerplate")
    docs = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("norm_text")
    )
    j = out.join(docs, "doc_id")
    rows = j.select(
        "doc_id",
        "n_segments",
        "n_boiler",
        "clean_text",
        "norm_text",
        F.size(F.split(F.col("norm_text"), r"\s+")).alias("n_tok"),
    ).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_segments"]
        if r["n_boiler"] == 0:
            # nothing dropped -> whitespace-normalized original
            assert r["clean_text"] == " ".join(r["norm_text"].split())
        else:
            # every clean token appears in the original (segments are
            # contiguous slices, so token multiset containment must hold)
            orig = r["norm_text"].split()
            kept = r["clean_text"].split() if r["clean_text"] else []
            assert len(kept) < r["n_tok"]
            from collections import Counter

            co, ck = Counter(orig), Counter(kept)
            assert all(ck[t] <= co[t] for t in ck)


def test_temperature_mixture_shares_normalize_and_flatten(spark):
    rows = _run(spark, "source_temperature_mixture").collect()
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-3
    # alpha < 1 compresses: over-represented sources sample below 1x,
    # under-represented above 1x
    for r in rows:
        if r["raw_share"] > 1.0 / len(rows):
            assert r["sample_factor"] < 1.0
        elif r["raw_share"] < 1.0 / len(rows) * 0.95:
            assert r["sample_factor"] > 1.0


def test_raking_converges_to_both_margins(spark):
    rows = _run(spark, "corpus_raking_weights").collect()
    total = sum(r["weighted_micro"] for r in rows)
    by_src: dict[str, int] = {}
    by_lb: dict[int, int] = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0) + r["weighted_micro"]
        by_lb[r["len_bucket"]] = by_lb.get(r["len_bucket"], 0) + r["weighted_micro"]
    # after 3 alternating rounds both margins are within 1% of uniform
    for share in (v / total for v in by_src.values()):
        assert abs(share - 1.0 / len(by_src)) < 0.01 / len(by_src) * len(by_src)
        assert abs(share - 1.0 / len(by_src)) < 0.0005
    for share in (v / total for v in by_lb.values()):
        assert abs(share - 1.0 / len(by_lb)) < 0.0025


def test_cms_join_size_upper_bound_and_accuracy(spark):
    row = _run(spark, "join_size_cms_estimate").collect()[0]
    assert row["upper_bound_holds"] is True
    assert row["cms_estimate"] >= row["exact_size"]
    # width 512 over ~1.5k distinct keys: collisions inflate, but far
    # below a vacuous bound
    assert row["rel_overestimate"] < 5.0


def test_bradley_terry_recovers_planted_order(spark):
    rows = sorted(_run(spark, "preference_bradley_terry").collect(),
                  key=lambda r: r["item"])
    # planted strengths are 1..8 increasing in item id. With ~17 votes
    # per pair at sf0.01, ADJACENT items (win prob 7/15 vs 8/15) can
    # legitimately swap — assert order recovery up to sampling noise:
    # strong Kendall tau, and the bottom half fully below the top half.
    scores = [r["score_micro"] for r in rows]
    concordant = sum(
        1 if scores[j] > scores[i] else -1
        for i in range(8)
        for j in range(i + 1, 8)
    )
    assert concordant / 28 > 0.8  # Kendall tau over 28 pairs
    assert max(scores[:4]) < min(scores[4:])
    assert rows[0]["rank"] == 8  # weakest planted item is last


def test_kappa_positive_for_bt_correlated_raters(spark):
    rows = _run(spark, "annotator_agreement_kappa").collect()
    assert len(rows) == 3
    # the shared BT signal at strengths 1..8 is WEAK (chance-corrected
    # agreement is near zero by design — conditionally independent
    # raters), so individual kappas hover around 0; the mean must still
    # be positive and every value must stay far from both degeneracies
    for r in rows:
        assert -0.2 < r["cohen_kappa"] < 0.9
        assert 0.0 < r["p_expected"] < 1.0
    assert sum(r["cohen_kappa"] for r in rows) / 3 > 0.0


def test_scc_labels_partition_and_minimum(spark):
    rows = _run(spark, "doc_graph_scc").collect()
    assert len(rows) == 500
    comp: dict[int, list[int]] = {}
    for r in rows:
        comp.setdefault(r["scc_id"], []).append(r["doc_id"])
    for scc_id, members in comp.items():
        assert scc_id == min(members)
        # block-structured graph: rings of 4 (or a trailing partial)
        assert len(members) <= 4
        # members are one contiguous id block
        assert max(members) - min(members) == len(members) - 1
