"""Time arbitrary registered queries with the bench methodology.

Usage:
    python time_query.py <name> [name ...]

Same protocol as bench.py (1 warm build+run, then min-of-3 timed
builder+noop runs, per-query cache clear + GC settle), but works for ANY
registered query, not just the bench=True set — the A/B harness for
optimization work on registry paths outside the headline bench. Honors
$SPARK_GRAFT_SF_DIR and $SPARK_GRAFT_CPUS exactly like bench.py. Prints a
JSON line per query plus a total. Read-only tooling: the driver never runs
this file.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:]
    if not names:
        print("usage: python time_query.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mapreduce_paradigm_spark.registry import all_specs
    from mapreduce_paradigm_spark.session import get_spark

    spark = get_spark(app_name="time-query", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    timings: dict[str, float] = {}
    for name in names:
        spec = specs[name]
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(1.0)
        spark._jvm.System.gc()
        time.sleep(0.5)
        spark.sparkContext.setJobDescription(f"time_query warm: {name}")
        df = spec.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        per_run: list[float] = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"time_query run{i}: {name}")
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            per_run.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(per_run)
        print(json.dumps({"query": name, "min": min(per_run), "runs": per_run}))
    print(json.dumps({"total": round(sum(timings.values()), 3), "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
