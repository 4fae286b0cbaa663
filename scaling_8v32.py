"""8-vs-32-core scaling point at 10× the bench fixture (VERDICT r12 ask
#7): the sf0.1 bench is per-query fixed-latency bound (8-core total ≈
32-core total in PERF_r12), so parallelism must be measured on a corpus
big enough to be throughput-bound. Reuses bench_sf1.py's deterministic
generators (zipf corpus + 5% controlled duplicates, hash-uniform
embeddings) at 10× sf0.1 cardinalities, then times the heaviest
documents/embeddings bench queries by pointing their REGISTERED builders
at the synthetic dir — same builders, same methodology (warm + min-of-N,
noop sink), one Spark at a time.

Run: python scaling_8v32.py → .gates/sf1_8v32_r13.json + stdout table.
Read-only tooling: the driver never runs this file.
"""

from __future__ import annotations

import json
import os
import time

_REPO = os.path.dirname(os.path.abspath(__file__))

QUERIES = [
    "dedup_clusters",
    "simhash_near_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_prefix_filter",
    "word_cooccurrence_pmi",
    "embedding_semantic_cluster_dedup",
]
N_DOCS = 50_000  # 10x sf0.1
N_VECS = 20_000  # 10x sf0.1
RUNS = 2


def main() -> None:
    import sys

    sys.path.insert(0, _REPO)
    from bench_sf1 import build_docs_zipf, build_dup_docs, build_embeddings
    from mapreduce_paradigm_spark.registry import all_specs
    from mapreduce_paradigm_spark.session import get_spark

    tmp = os.environ.get("SPARK_GRAFT_SCALE_TMP", "/tmp/spark_graft_scale")
    corpus = f"{tmp}/corpus_10x"
    os.makedirs(corpus, exist_ok=True)

    # generate once (deterministic); reuse across core counts
    if not os.path.exists(f"{corpus}/documents.parquet/_SUCCESS"):
        spark = get_spark(app_name="scale-gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        build_docs_zipf(spark, N_DOCS, f"{tmp}/docs_raw")
        build_dup_docs(spark, f"{tmp}/docs_raw", f"{corpus}/documents.parquet")
        build_embeddings(spark, N_VECS, f"{corpus}/embeddings.parquet")
        spark.stop()

    specs = all_specs()
    out: dict[str, dict] = {}
    for cpus in (32, 8):
        spark = get_spark(app_name=f"scale-{cpus}", master=f"local[{cpus}]")
        spark.sparkContext.setLogLevel("ERROR")
        for name in QUERIES:
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            time.sleep(1.0)
            df = specs[name].builder(spark, corpus)
            df.write.format("noop").mode("overwrite").save()  # warm
            per = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                df = specs[name].builder(spark, corpus)
                df.write.format("noop").mode("overwrite").save()
                per.append(round(time.perf_counter() - t0, 2))
            out.setdefault(name, {})[f"c{cpus}"] = min(per)
            print(f"[{cpus} cores] {name}: {per}")
        spark.stop()

    for name, row in out.items():
        row["ratio_8_over_32"] = round(row["c8"] / row["c32"], 2)
    result = {"n_docs": N_DOCS, "n_vecs": N_VECS, "runs": RUNS, "queries": out}
    os.makedirs(f"{_REPO}/.gates", exist_ok=True)
    with open(f"{_REPO}/.gates/sf1_8v32_r13.json", "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
