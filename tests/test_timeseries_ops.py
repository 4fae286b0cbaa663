"""Property pins for the time-series/analytics tier that the DuckDB hash
gate can't express: PageRank mass conservation, gap-fill spine density,
funnel monotonicity, cohort-triangle sanity. (Cross-engine value parity for
all six queries lives in test_oracle_parity.py — they all carry oracles.)"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce_paradigm_spark.registry import all_specs

from .conftest import SF_CORRECT


def _run(spark, name):
    return all_specs()[name].builder(spark, SF_CORRECT).collect()


def test_pagerank_mass_and_bounds(spark):
    rows = _run(spark, "doc_graph_pagerank")
    n = len(rows)
    assert n > 0
    total = sum(r["rank_ppm"] for r in rows)
    # each node's rank is 150000 + 0.85·(inbound mass); integer floors only
    # ever LOSE ppm, so total ∈ (0.97·N, 1.0·N] million after 5 rounds
    assert total <= n * 1_000_000
    assert total > n * 970_000
    assert min(r["rank_ppm"] for r in rows) >= 150_000


def test_gap_fill_spine_is_dense_and_locf(spark):
    rows = _run(spark, "events_hourly_gap_fill")
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    assert len(per_user) > 10
    gaps_seen = 0
    for seq in per_user.values():
        seq.sort(key=lambda r: r["hr"])
        last_val = None
        for prev, cur in zip(seq, seq[1:]):
            assert (cur["hr"] - prev["hr"]).total_seconds() == 3600  # dense
        for r in seq:
            if r["n_events"] == 0:
                gaps_seen += 1
                assert r["filled_val"] == last_val  # LOCF carries
            else:
                last_val = r["filled_val"]
    assert gaps_seen > 0  # fixture actually exercises the fill


def test_funnel_stages_are_ordered(spark):
    rows = _run(spark, "user_funnel_stages")
    assert rows
    for r in rows:
        if r["first_click"] is not None:
            assert r["first_click"] >= r["first_view"]
        if r["first_purchase"] is not None:
            assert r["first_click"] is not None  # no stage skipping
            assert r["first_purchase"] >= r["first_click"]
        expect = 1 + (r["first_click"] is not None) + (
            r["first_purchase"] is not None
        )
        assert r["stages_reached"] == expect


def test_retention_cohort_triangle(spark):
    rows = _run(spark, "customer_retention_cohorts")
    by_cohort = defaultdict(dict)
    for r in rows:
        by_cohort[r["cohort_month"]][r["month_offset"]] = r["n_active"]
    for offsets in by_cohort.values():
        assert 0 in offsets  # every cohort is active in its own month
        assert all(o >= 0 for o in offsets)
        # offset-0 row counts the whole cohort: no later month exceeds it
        assert max(offsets.values()) == offsets[0]


def test_kcore_matches_python_peeling(spark):
    from collections import defaultdict

    from mapreduce_paradigm_spark.queries.graphtext import _irregular_graph
    from mapreduce_paradigm_spark.registry import all_specs

    from .conftest import SF_CORRECT

    raw = _irregular_graph(spark, SF_CORRECT).collect()
    edges = {
        (min(r["a"], r["b"]), max(r["a"], r["b"])) for r in raw if r["a"] != r["b"]
    }
    k = 4
    while True:
        deg: dict[int, int] = defaultdict(int)
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    want: dict[int, int] = defaultdict(int)
    for a, b in edges:
        want[a] += 1
        want[b] += 1

    got = {
        r["v"]: r["deg"]
        for r in all_specs()["doc_graph_kcore"].builder(spark, SF_CORRECT).collect()
    }
    assert got == dict(want)
    assert len(got) > 0
    assert all(d >= k for d in got.values())


def _half_up(x: float) -> int:
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_cusum_matches_python_scan(spark):
    """The integer identity n*P_t - t*T must reproduce the float CUSUM
    argmax exactly: recompute per-user scans in Python on micro ints."""
    from collections import defaultdict

    from mapreduce_paradigm_spark.registry import all_specs
    from mapreduce_paradigm_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    got = {
        r["user_id"]: (r["cp_ts"], r["cusum_max"])
        for r in all_specs()["events_cusum_changepoint"]
        .builder(spark, SF_CORRECT)
        .collect()
    }
    rows = (
        load_table(spark, SF_CORRECT, "events")
        .filter("value IS NOT NULL")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series = defaultdict(list)
    for r in rows:
        series[r["user_id"]].append(
            (r["ts"], r["event_id"], _half_up(r["value"] * 1e6))
        )
    checked = 0
    for uid, evs in series.items():
        if len(evs) < 20:
            assert uid not in got
            continue
        evs.sort(key=lambda e: (e[0], e[1]))
        total = sum(v for _, _, v in evs)
        n = len(evs)
        p = 0
        best = (-1, None)
        for t, (ts, _, v) in enumerate(evs, start=1):
            p += v
            s_abs = abs(n * p - t * total)
            if s_abs > best[0]:
                best = (s_abs, ts)
        want_ts = best[1]
        # Spark F.round is half-up; Python round is half-even
        import math

        want_max = math.floor(best[0] / n + 0.5) / 1e6
        assert got[uid][0] == want_ts, uid
        assert abs(got[uid][1] - want_max) < 1e-9, uid
        checked += 1
    assert checked > 0


def test_asof_nearest_edges(spark):
    """Nearest-as-of boundary semantics: equal-ts matches as backward (Δ=0),
    exact-tolerance boundary included, beyond-tolerance NULL, forward wins
    only when strictly closer, equidistant prefers backward."""
    from mapreduce_paradigm_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 10:00:00"),  # click at same ts -> backward Δ=0
            (1, 11, "2024-01-01 12:00:00"),  # clicks at 11:30 and 12:30 -> tie, backward
            (1, 12, "2024-01-01 15:00:00"),  # nearest is forward 15:10 vs back 12:30
            (1, 13, "2024-01-01 20:00:00"),  # nothing within 30min -> NULL
            (2, 20, "2024-01-01 10:30:00"),  # other key: exactly 30min back -> included
        ],
        "user_id BIGINT, view_id BIGINT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 10:00:00"),
            (1, 101, "2024-01-01 11:30:00"),
            (1, 102, "2024-01-01 12:30:00"),
            (1, 103, "2024-01-01 15:10:00"),
            (2, 200, "2024-01-01 10:00:00"),
        ],
        "user_id BIGINT, event_id BIGINT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = asof_join_nearest(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["event_id"], tolerance_seconds=1800,
    )
    got = {r["view_id"]: r["asof_event_id"] for r in out.collect()}
    assert got == {10: 100, 11: 101, 12: 103, 13: None, 20: 200}


def test_asof_nearest_null_and_duplicate_left_rows(spark):
    """Round-3 advisory regression pin: the old implementation rejoined
    backward/forward passes on the FULL left row, silently DROPPING any
    left row containing a NULL (NULL != NULL in a join) and cross-pairing
    fully-duplicate left rows. The single-union rewrite must keep both:
    one output row per input row, NULLs intact."""
    from mapreduce_paradigm_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, None, "2024-01-01 10:05:00"),   # NULL payload column
            (1, None, "2024-01-01 10:05:00"),   # exact duplicate row
            (1, 7, "2024-01-01 10:05:00"),
        ],
        "user_id BIGINT, payload BIGINT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:00:00")],
        "user_id BIGINT, event_id BIGINT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = asof_join_nearest(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["event_id"], tolerance_seconds=1800,
    ).collect()
    assert len(out) == 3, "NULL-bearing / duplicate left rows must survive"
    assert all(r["asof_event_id"] == 100 for r in out)
