"""Benchmark harness: runs the headline (bench=True) queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Results are materialized through the noop sink (full execution, no write
cost), so timings reflect the actual distributed plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mapreduce_paradigm_spark.registry import all_specs
    from mapreduce_paradigm_spark.session import get_spark

    spark = get_spark(app_name="mapreduce-paradigm-spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")  # comma-list for local A/B
    specs = {n: s for n, s in all_specs().items() if s.bench}
    if only:
        wanted = {w.strip() for w in only.split(",") if w.strip()}
        specs = {n: s for n, s in specs.items() if n in wanted}
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, spec in sorted(specs.items()):
        # fresh slate per query: drop persisted intermediates from earlier
        # queries and nudge the JVM so GC debt doesn't land in our window.
        # The ContextCleaner deletes dereferenced shuffle files ASYNCHRONOUSLY
        # after the gc — without a settle pause that disk/CPU work lands inside
        # the next query's timed runs (observed as monotone run degradation).
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        time.sleep(1.0)
        spark._jvm.System.gc()
        time.sleep(0.5)
        df = spec.builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan + JIT + cache file listing)
        per_run: list[float] = []
        for _ in range(3):  # min-of-3: steady-state wall time, host-noise-proof
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            per_run.append(round(time.perf_counter() - t0, 3))
        # per-run array published so a future regression is distinguishable
        # from the documented bimodal GC/JIT + host-load noise
        runs[name] = per_run
        timings[name] = min(per_run)

    total = round(sum(timings.values()), 3)
    # The driver captures only the TAIL of stdout (round-3 lesson: the single
    # line with embedded per-run arrays outgrew the captured tail and parsed
    # as null).  So: full detail goes to BENCH_DETAIL.json on disk, and the
    # FINAL stdout line is the compact headline the driver parses.
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "sf": sf,
        "cpus": int(cpus),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
