"""One-off sf1 scaling measurement for the heavy dedup/ANN tier
(round-4 verdict ask #7): everything at sf0.1 finishes in a few seconds,
so the Σdf² / Σ|c|² / banding cost arguments had no recorded 10× point.

No sf1 fixture exists (and /root/testdata is read-only), so this harness
generates DISTRIBUTION-PRESERVING synthetic corpora at two sizes with the
SAME generator and times each operator at both, recording the observed
scaling exponent log10(t_10x / t_1x):

- documents: half-splice construction — each synthetic doc is the first
  half of one hash-picked sf0.1 doc's tokens plus the second half of
  another's. Shingle/token statistics track the fixture, while cross-doc
  Jaccard to parents stays ≈1/3 (< the 0.5 threshold), so near-dup
  DENSITY does not inflate with scale (naive replication would add 45
  near-identical copies per group and measure output explosion, not
  operator scaling). BOTH scale points use the construction, so the
  exponent is generator-consistent.
- embeddings: hash-uniform dim-64 vectors (the fixture's observed regime —
  see the ANN recall floors), again at both scales.

semantic_cluster_near_dups is measured two ways at 10×: nlist FIXED at 8
(exposes the documented Σ|c|² superlinearity — the failure mode) and
nlist scaled 10× with the corpus (the documented mitigation; expected
≈linear). Run: python bench_sf1.py → .gates/sf1.json + stdout table.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))


def _timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def build_docs(spark, sf_dir: str, n: int, out: str) -> None:
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.split(F.lower(F.trim("text")), r"\s+").alias("toks"),
        )
    )
    nb = base.count()
    ids = spark.range(n).select(
        F.col("id").alias("new_id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(nb)).alias("p1"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(nb)).alias("p2"),
    )
    a = base.select(
        F.col("doc_id").alias("p1"),
        F.expr("slice(toks, 1, size(toks) DIV 2)").alias("h1"),
    )
    b = base.select(
        F.col("doc_id").alias("p2"),
        F.expr("slice(toks, size(toks) DIV 2 + 1, size(toks))").alias("h2"),
    )
    (
        ids.join(a, "p1")
        .join(b, "p2")
        .select(
            F.col("new_id").alias("doc_id"),
            F.concat_ws(" ", F.concat("h1", "h2")).alias("text"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )


def build_embeddings(spark, n: int, out: str) -> None:
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), j -> "
            "(CAST(pmod(xxhash64(id, j, 17), 2001) AS DOUBLE) - 1000)/1000)"
        ).alias("embedding"),
    ).write.mode("overwrite").parquet(out)


def main() -> None:
    from mapreduce_paradigm_spark.operators.components import (
        connected_components_star,
    )
    from mapreduce_paradigm_spark.operators.dedup import (
        embedding_near_dup_lsh,
        jaccard_pairs,
        jaccard_pairs_prefix_filter,
        minhash_lsh_pairs,
        release_caches,
        semantic_cluster_near_dups,
        simhash_near_pairs,
    )
    from mapreduce_paradigm_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-sf1", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = os.environ.get("SPARK_GRAFT_SF1_TMP", "/tmp/sf1_scaling")
    sizes = {"1x": 5_000, "10x": 50_000}
    for tag, n in sizes.items():
        build_docs(spark, sf_dir, n, f"{tmp}/docs_{tag}")
        build_embeddings(spark, n, f"{tmp}/emb_{tag}")

    results: dict[str, dict[str, float]] = {}

    def run(name: str, tag: str, df) -> None:
        release_caches()
        t = _timed(df)
        results.setdefault(name, {})[tag] = t
        print(f"{name:36s} {tag:>4s}: {t:8.2f}s", flush=True)

    for tag in ("1x", "10x"):
        docs = spark.read.parquet(f"{tmp}/docs_{tag}")
        emb = spark.read.parquet(f"{tmp}/emb_{tag}")
        run("ngram_jaccard_pairs_dfcap64", tag,
            jaccard_pairs(docs, k=3, threshold=0.5, max_shingle_df=64))
        run("ngram_jaccard_prefix_filter", tag,
            jaccard_pairs_prefix_filter(docs, k=3, threshold=0.5))
        run("minhash_lsh_pairs", tag,
            minhash_lsh_pairs(docs, k=3, num_hashes=32, bands=8, threshold=0.5))
        run("simhash_near_pairs", tag, simhash_near_pairs(docs, max_hamming=3))
        run("dedup_clusters_star", tag,
            connected_components_star(
                jaccard_pairs(docs, k=3, threshold=0.5, max_shingle_df=64),
                edges_unique=True,
            ))
        run("embedding_near_dup_lsh", tag, embedding_near_dup_lsh(emb))
        if tag == "1x":
            run("semantic_cluster_dedup_nlist8", tag,
                semantic_cluster_near_dups(emb, threshold=0.42, nlist=8))
        else:
            run("semantic_cluster_dedup_nlist8", tag,
                semantic_cluster_near_dups(emb, threshold=0.42, nlist=8))
            run("semantic_cluster_dedup_nlist_scaled", tag,
                semantic_cluster_near_dups(emb, threshold=0.42, nlist=80))

    import math

    out = {"sizes": sizes, "queries": {}}
    for name, t in sorted(results.items()):
        row = dict(t)
        if "1x" in t and "10x" in t:
            row["exponent"] = round(math.log10(t["10x"] / t["1x"]), 2)
        out["queries"][name] = row
        print(name, row, flush=True)
    os.makedirs(os.path.join(_REPO, ".gates"), exist_ok=True)
    with open(os.path.join(_REPO, ".gates", "sf1.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote .gates/sf1.json")
    spark.stop()


if __name__ == "__main__":
    main()
