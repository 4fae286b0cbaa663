"""Accuracy bounds for the approximate sketch aggregates — the scale path
(one pass, tiny fixed state) must stay within its advertised error of the
exact answers it replaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paradigm_spark.sources.tables import load_table

from .conftest import SF_CORRECT


def test_hll_within_relative_error(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    row = li.agg(
        F.count_distinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    rel = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel < 0.05, f"HLL rel error {rel:.4f} (exact={row['exact']}, approx={row['approx']})"


def test_hll_per_group_matches_registered_query_shape(spark):
    """Per-group relative-error oracle for the REGISTERED approx query
    (approx_distinct_parts is rows-only at the driver; this pins its
    accuracy against exact distinct counts, group by group)."""
    from mapreduce_paradigm_spark.registry import all_specs

    approx = {
        r["p_brand"]: r["approx_parts"]
        for r in all_specs()["approx_distinct_parts"].builder(spark, SF_CORRECT).collect()
    }
    exact = {
        r["p_brand"]: r["exact_parts"]
        for r in load_table(spark, SF_CORRECT, "part")
        .groupBy("p_brand")
        .agg(F.count_distinct("p_partkey").alias("exact_parts"))
        .collect()
    }
    assert set(approx) == set(exact)
    for brand, ex in exact.items():
        rel = abs(approx[brand] - ex) / ex
        # default rsd = 0.05; allow 3 sigma per group
        assert rel < 0.15, f"{brand}: HLL rel error {rel:.4f} (exact={ex}, approx={approx[brand]})"


def test_hll_sketch_rollup_accuracy_and_merge(spark):
    """The registered mergeable-sketch rollup (rows-only at the driver):
    per-priority estimates AND the unioned ALL row must sit within HLL
    error of the exact distinct counts — the union must behave like a
    sketch built over the whole column, not a sum of group estimates."""
    from mapreduce_paradigm_spark.registry import all_specs

    got = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in all_specs()["priority_customer_hll_rollup"]
        .builder(spark, SF_CORRECT)
        .collect()
    }
    orders = load_table(spark, SF_CORRECT, "orders")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = orders.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for key, ex in exact.items():
        rel = abs(got[key] - ex) / ex
        # lgConfigK=14 → rsd ≈ 0.0065; allow a wide 3%+ margin
        assert rel < 0.05, f"{key}: rel error {rel:.4f} (exact={ex}, approx={got[key]})"


def test_approx_percentile_close_to_exact(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", 0.5).alias("exact"),
        F.approx_percentile("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    rel = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel < 0.01, f"approx_percentile rel error {rel:.4f}"


def test_tdigest_rank_error_and_merge_invariance(spark):
    """t-digest accuracy pin: each estimated quantile's TRUE rank must be
    within 1% of the requested rank (tail-weighted sketches do far better
    at p99); and the digest total weight must equal the row count (no
    mass lost through the salted tree merge)."""
    import numpy as np

    from mapreduce_paradigm_spark.operators.tdigest import (
        tdigest_quantiles,
        tdigest_sketch,
    )
    from mapreduce_paradigm_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    li = load_table(spark, SF_CORRECT, "lineitem")
    vals = np.sort(
        np.array([r[0] for r in li.select("l_extendedprice").collect()], dtype=float)
    )
    n = len(vals)
    digest = tdigest_sketch(li, "l_extendedprice", max_centroids=100).persist()
    assert digest.agg({"weight": "sum"}).collect()[0][0] == n  # mass conserved
    assert digest.count() <= 120  # bounded summary
    for row in tdigest_quantiles(digest, [0.5, 0.9, 0.99, 0.999]).collect():
        q, est = row["q"], row["estimate"]
        true_rank = np.searchsorted(vals, est) / n
        assert abs(true_rank - q) <= 0.01, (q, est, true_rank)
    digest.unpersist()


def test_tdigest_split_merge_equals_whole_accuracy(spark):
    """The mergeability contract itself: sketch two disjoint halves
    separately (as a store-per-day pipeline would), merge the STORED
    centroid sets, and the merged digest must read quantiles as
    accurately as a digest built over the whole data in one pass."""
    import numpy as np

    from mapreduce_paradigm_spark.operators.tdigest import (
        tdigest_quantiles,
        tdigest_sketch,
    )
    from mapreduce_paradigm_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    li = load_table(spark, SF_CORRECT, "lineitem")
    half_a = li.filter("l_orderkey % 2 = 0")
    half_b = li.filter("l_orderkey % 2 = 1")
    from mapreduce_paradigm_spark.operators.tdigest import tdigest_merge

    da = tdigest_sketch(half_a, "l_extendedprice")
    db = tdigest_sketch(half_b, "l_extendedprice")
    pdf = tdigest_merge(da, db).toPandas().sort_values("mean")
    m = pdf["mean"].to_numpy(np.float64)
    w = pdf["weight"].to_numpy(np.int64)
    vals = np.sort(
        np.array([r[0] for r in li.select("l_extendedprice").collect()], dtype=float)
    )
    n = len(vals)
    assert int(w.sum()) == n
    cum = np.cumsum(w) - w / 2
    for q in (0.5, 0.9, 0.99, 0.999):
        est = float(np.interp(q * w.sum(), cum, m))
        true_rank = np.searchsorted(vals, est) / n
        assert abs(true_rank - q) <= 0.01, (q, est, true_rank)


def test_tdigest_by_key_grouped_p99(spark):
    """Grouped digests: per-returnflag p99 from ~100-centroid summaries
    must sit within 1% rank of each group's true distribution."""
    import numpy as np

    from mapreduce_paradigm_spark.operators.tdigest import tdigest_by_key
    from mapreduce_paradigm_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    li = load_table(spark, SF_CORRECT, "lineitem")
    digests = tdigest_by_key(li, "l_returnflag", "l_extendedprice").toPandas()
    truth = {
        flag: np.sort(
            np.array(
                [
                    r[0]
                    for r in li.filter(li.l_returnflag == flag)
                    .select("l_extendedprice")
                    .collect()
                ],
                dtype=float,
            )
        )
        for flag in ("A", "N", "R")
    }
    for flag, grp in digests.groupby("l_returnflag"):
        grp = grp.sort_values("mean")
        m = grp["mean"].to_numpy(float)
        w = grp["weight"].to_numpy(float)
        vals = truth[flag]
        assert int(w.sum()) == len(vals)
        cum = np.cumsum(w) - w / 2
        est = float(np.interp(0.99 * w.sum(), cum, m))
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - 0.99) <= 0.01, (flag, est, rank)


def test_ddsketch_relative_error_bound(spark):
    """DDSketch guarantee: every estimate within α=1% RELATIVE error of the
    true quantile value (the bound t-digest doesn't make)."""
    import numpy as np

    from mapreduce_paradigm_spark.registry import all_specs
    from mapreduce_paradigm_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    li = load_table(spark, SF_CORRECT, "lineitem")
    vals = np.sort(
        np.array([r[0] for r in li.select("l_extendedprice").collect()], dtype=float)
    )
    est = {
        r["q"]: r["estimate"]
        for r in all_specs()["price_ddsketch_quantiles"]
        .builder(spark, SF_CORRECT)
        .collect()
    }
    for q, e in est.items():
        true = float(np.quantile(vals, q, method="inverted_cdf"))
        assert abs(e / true - 1) <= 0.0101, (q, e, true)


def test_count_min_never_underestimates(spark):
    """CMS safety property: estimates dominate the truth for EVERY word
    (not just the top-10 readout), and the overestimate is bounded by the
    colliding mass N/w per row."""
    from mapreduce_paradigm_spark.registry import all_specs
    from mapreduce_paradigm_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    rows = (
        all_specs()["word_count_min_sketch_hh"].builder(spark, SF_CORRECT).collect()
    )
    assert len(rows) == 10
    from mapreduce_paradigm_spark.functions import doc_words

    total = doc_words(load_table(spark, SF_CORRECT, "documents")).count()
    for r in rows:
        assert r["cms_est"] >= r["true_n"], r
        # w=64 on a Zipf stream: a head word (~N/30 mass) can share a
        # bucket with the readout word in all d rows, so the practical
        # bound is a few expected bucket-masses, not the uniform N/w
        assert r["cms_est"] - r["true_n"] <= total / 64 * 3, r


def test_streaming_tdigest_accumulates_and_stays_accurate(spark):
    """Streaming digest: state survives 4 real micro-batches (total weight
    equals the row count), stays bounded, and the FINAL digest reads
    quantiles within 1% rank of the exact distribution."""
    import numpy as np

    from mapreduce_paradigm_spark.sources.tables import load_table
    from mapreduce_paradigm_spark.streaming import (
        run_to_memory,
        streaming_value_tdigest,
    )

    from .conftest import SF_CORRECT

    out = run_to_memory(
        streaming_value_tdigest(spark, SF_CORRECT), output_mode="update"
    ).toPandas()
    # update mode re-emits per batch; the final emission carries the digest
    final = out.iloc[out["total_weight"].to_numpy().argmax()]
    ev = load_table(spark, SF_CORRECT, "events")
    vals = np.sort(
        np.array([r[0] for r in ev.select("value").collect()], dtype=float)
    )
    assert int(final["total_weight"]) == len(vals)  # state accumulated
    assert final["n_centroids"] <= 120  # bounded however long the stream
    m = np.asarray(final["means"], dtype=float)
    w = np.asarray(final["weights"], dtype=float)
    order = np.argsort(m)
    m, w = m[order], w[order]
    cum = np.cumsum(w) - w / 2
    for q in (0.5, 0.9, 0.99):
        est = float(np.interp(q * w.sum(), cum, m))
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - q) <= 0.01, (q, est, rank)


def test_tdigest_quantiles_empty_digest(spark):
    """Round-3 advisory regression pin: an empty digest (all-NULL/empty
    input column) must yield NULL estimates, not IndexError on cum[0]."""
    from mapreduce_paradigm_spark.operators.tdigest import (
        tdigest_quantiles,
        tdigest_sketch,
    )

    empty = spark.createDataFrame([(None,), (None,)], "v DOUBLE")
    digest = tdigest_sketch(empty, "v")
    rows = tdigest_quantiles(digest, [0.5, 0.9]).collect()
    assert [r["q"] for r in rows] == [0.5, 0.9]
    assert all(r["estimate"] is None for r in rows)
