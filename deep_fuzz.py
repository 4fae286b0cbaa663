"""Opt-in deep differential fuzz: N examples per axis (fifteen axes),
Spark vs DuckDB.

The committed hypothesis tests in tests/test_properties.py run small
DERANDOMIZED budgets (15-25 examples/axis) so the suite stays fast and
deterministic — that is the CI contract. This runner reuses the exact
same strategies and comparison semantics to hunt far past those budgets
with explicit seeds, the way the round-7 receipts in BASELINE.md were
produced (8,500 examples, 0 divergences). Any divergence it prints is a
real cross-engine disagreement on shared-ANSI SQL: file it as a finding.

Usage:
    python deep_fuzz.py [N_per_axis] [seed]
    FUZZ_AXES=join,setop python deep_fuzz.py 500 1234   # subset of axes
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
from hypothesis import HealthCheck, given, seed, settings

from tests.test_properties import (
    _agg_query,
    _datetime_query,
    _distinct_filter_query,
    _grouping_query,
    _hof_query,
    _json_query,
    _lateral_query,
    _map_query,
    _join_query,
    _orderby_limit_query,
    _predicate,
    _scalar_expr_query,
    _string_pred_query,
    _setop_query,
    _window_query,
)
from mapreduce_paradigm_spark.session import get_spark

SF = os.environ.get("FUZZ_SF_DIR", "/root/testdata/sf0.001")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 250
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 7

spark = get_spark(app_name="deep-fuzz", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
for t in ("lineitem", "orders"):
    spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
con = duckdb.connect()
for t in ("lineitem", "orders"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

failures = []
counts = {}


def norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(
                (v is None, round(v, 9) if isinstance(v, float) else (0 if v is None else v))
                for v in r
            )
        )
    return sorted(out)


def check(axis, sql):
    counts[axis] = counts.get(axis, 0) + 1
    # the hof axis renders a semantically-identical (spark_sql, duck_sql)
    # PAIR (zip_with/aggregate have no same-name DuckDB twin); every other
    # axis runs one shared-ANSI string on both engines
    spark_sql, duck_sql = sql if isinstance(sql, tuple) else (sql, sql)
    got = norm(spark.sql(spark_sql).collect())
    want = norm(con.execute(duck_sql).fetchall())
    if axis == "grouping" and not got and want:
        # the PINNED empty-input divergence (ANSI () grouping set on empty
        # input: DuckDB one zero-row super-aggregate, Spark none) — same
        # carve-out shape as the committed test; anything else still fails
        ok = all(
            r[:4] == ((True, 0), (True, 0), (False, 1), (False, 1))
            and r[4] == (False, 0) and r[5] == (True, 0)
            for r in want
        )
        if ok:
            return
    if got != want:
        diff = next(((a, b) for a, b in zip(got, want) if a != b), None)
        failures.append((axis, sql, len(got), len(want), diff))
        print(f"DIVERGENCE [{axis}]: {sql}\n  spark={len(got)} duck={len(want)} first={diff}")


def pred_sql(p):
    # the predicate axis wraps its predicate into the fixed aggregate the
    # committed test uses, so coverage is identical
    return (
        "SELECT l_returnflag, count(*) AS n, "
        "sum(CAST(l_quantity AS BIGINT)) AS sq "
        f"FROM lineitem WHERE {p} GROUP BY l_returnflag"
    )


AXES = [
    ("predicate", _predicate(), pred_sql),
    ("groupagg", _agg_query(), lambda s: s),
    ("window", _window_query(), lambda s: s),
    ("join", _join_query(), lambda s: s),
    ("setop", _setop_query(), lambda s: s),
    ("distinct_filter", _distinct_filter_query(), lambda s: s),
    ("grouping", _grouping_query(), lambda s: s),
    ("orderby_limit", _orderby_limit_query(), lambda s: s),
    ("scalar_expr", _scalar_expr_query(), lambda s: s),
    ("string_pred", _string_pred_query(), lambda s: s),
    ("datetime", _datetime_query(), lambda s: s),
    ("hof", _hof_query(), lambda s: s),
    ("map_hof", _map_query(), lambda s: s),
    ("json_path", _json_query(), lambda s: s),
    ("lateral", _lateral_query(), lambda s: s),
]
only = os.environ.get("FUZZ_AXES")
if only:
    AXES = [a for a in AXES if a[0] in only.split(",")]


def make_runner(axis, strat, to_sql):
    @seed(SEED)
    @settings(
        max_examples=N,
        deadline=None,
        derandomize=False,
        suppress_health_check=list(HealthCheck),
        database=None,
    )
    @given(strat)
    def run(x):
        check(axis, to_sql(x))

    return run


t0 = time.time()
for axis, strat, to_sql in AXES:
    ta = time.time()
    try:
        make_runner(axis, strat, to_sql)()
    except AssertionError:
        pass  # failures recorded in the list; keep hunting other axes
    print(f"axis {axis}: {counts.get(axis, 0)} examples in {time.time() - ta:.0f}s")

print(
    f"\nTOTAL: {sum(counts.values())} examples, {len(failures)} divergences, "
    f"{time.time() - t0:.0f}s"
)
for f in failures:
    print(f)
spark.stop()
sys.exit(1 if failures else 0)
