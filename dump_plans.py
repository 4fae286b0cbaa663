"""Capture `.explain("formatted")` output for registered queries.

Usage:
    python dump_plans.py <suffix> [name ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt (default round:
r13) for each query (default: the bench set). Plans are pre-execution (AQE
isFinalPlan=false) — the shape audit targets Exchange count, join strategy,
PushedFilters/ReadSchema and Python-eval nodes, all visible in the initial
physical plan.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mapreduce_paradigm_spark.registry import all_specs
    from mapreduce_paradigm_spark.session import get_spark

    specs = all_specs()
    if not names:
        names = sorted(n for n, s in specs.items() if s.bench)

    spark = get_spark(app_name="plan-dump", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        _REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        spec = specs[name]
        try:
            df = spec.builder(spark, sf_dir)
            text = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure in place
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
