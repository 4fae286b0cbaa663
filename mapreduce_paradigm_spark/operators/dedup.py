"""Deduplication operators for large-scale training-data pipelines.

Four tiers, all built on the reference's tokenizer semantics (O3/O4,
/root/reference/src/main.cpp:191-208, 239-242):

- exact:     hash-groupBy on normalized text — one shuffle, trivially scales.
- n-gram Jaccard: exact pairwise similarity via a shingle inverted list —
  the ground truth the approximate tiers are judged against.
- MinHash + LSH: signature/banding — candidate generation cost is linear in
  corpus size, the scale path for 100 TB near-dup detection.
- SimHash: 63-bit fingerprints + pigeonhole-chunked Hamming join.

Everything is DataFrame-native (xxhash64 / bit ops / window), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_paradigm_spark.functions import word_shingles

# --- normalization -----------------------------------------------------------


def normalized_text(col) -> F.Column:
    """Whitespace-collapsed, lowercased text — the exact-dedup key."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical (normalized) documents: one shuffle on the md5 key.

    At 100 TB the md5 is computed scan-side and the shuffle carries only
    (hash, doc_id) — never the text itself.
    """
    return (
        docs.select("doc_id", F.md5(normalized_text(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


# --- shingles + exact Jaccard ------------------------------------------------


def shingle_sets(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, shingle) pairs; shingles are k-gram word windows
    over the lowercased whitespace tokenization."""
    arr = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )
    return (
        arr.select("doc_id", F.explode(word_shingles("toks", k)).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs ≥ threshold.

    Inverted-list self-join: pairs are only generated for docs sharing a
    shingle, so cost is Σ df(shingle)² — at scale, cap ``max_shingle_df``
    to drop stop-shingles (standard candidate pruning; slightly lowers
    recall for pathological templates, exact for everything else).
    """
    sh = shingle_sets(docs, k, text_col)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df).select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    jac = F.col("n_common") / (F.col("s1.sz") + F.col("s2.sz") - F.col("n_common"))
    return (
        common.join(s1, F.col("d1") == F.col("s1.doc_id"))
        .join(s2, F.col("d2") == F.col("s2.doc_id"))
        .filter(jac >= threshold)
        .select("d1", "d2", jac.alias("jaccard"))
    )


# --- MinHash + LSH -----------------------------------------------------------


def minhash_signatures(
    docs: DataFrame, k: int = 3, num_hashes: int = 32, text_col: str = "text"
) -> DataFrame:
    """Per-doc MinHash signature: hash each shingle once to a 64-bit base,
    then derive ``num_hashes`` independent hash families as
    ``xxhash64(base, i)`` (seed-mixed, overflow-free under ANSI mode)
    reduced by min. One aggregation, no UDFs; signature width is a column
    count, not state."""
    sh = shingle_sets(docs, k, text_col).withColumn("h", F.xxhash64("shingle"))
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    ``bands`` bands of ``num_hashes/bands`` rows; docs colliding in any band
    become candidates (cost linear in corpus + Σ bucket²), then candidates
    are verified against the true shingle Jaccard so precision is exact and
    only recall is approximate — at (32 hashes, 8 bands) recall for j≥0.9
    pairs is ≈0.9998.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, k, num_hashes, text_col)
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("bh")) for b in range(bands)])
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.bh")
    a = stacked.alias("a")
    b = stacked.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # verify candidates against exact Jaccard (computed only for candidates)
    sh = shingle_sets(docs, k, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    common = (
        candidates.join(sa, F.col("d1") == F.col("sa.doc_id"))
        .join(sb, (F.col("d2") == F.col("sb.doc_id")) & (F.col("sa.shingle") == F.col("sb.shingle")))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("s1.sz") + F.col("s2.sz") - F.col("n_common"))
    return (
        common.join(sizes.alias("s1"), F.col("d1") == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), F.col("d2") == F.col("s2.doc_id"))
        .filter(jac >= threshold)
        .select("d1", "d2", jac.alias("jaccard"))
    )


# --- embedding-cosine near-dup ----------------------------------------------


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: all (d1 < d2) with
    cosine ≥ threshold. The semantic-dedup tier — catches paraphrases
    that defeat the lexical tiers (Jaccard/MinHash/SimHash).

    Exact all-pairs form (oracle-checkable): broadcast self-join, cosine in
    codegen via ``zip_with``/``aggregate``. At 100 TB the identical verify
    step runs over LSH candidates instead of all pairs: normalize each
    vector ONCE scan-side (cosine → dot product), bucket with
    ``similarity.hyperplane_buckets``, equi-join on bucket, rerank exact —
    candidates drop 2^nbits-fold while this function's filter semantics
    stay the verification step.
    """
    d = emb.select(
        F.col(id_col).alias("id"), F.col(emb_col).cast("array<double>").alias("e")
    )
    a, b = d.alias("a"), d.alias("b")
    from mapreduce_paradigm_spark.functions import cosine_similarity

    return (
        a.join(F.broadcast(b), F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", cosine_similarity("a.e", "b.e"))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("d1"),
            F.col("b.id").alias("d2"),
            F.round("cosine", 4).alias("cosine"),
        )
    )


# --- SimHash -----------------------------------------------------------------

_SIMHASH_BITS = 63  # bit 63 would overflow signed long reassembly


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """63-bit SimHash over the distinct-word set of each document.

    Per bit j: sum ±1 contributions of each word hash's bit j; sign → bit.
    63 tiny aggregates in one pass (whole-stage codegen keeps this cheap).
    """
    words = (
        docs.select("doc_id", F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
        .withColumn("h", F.xxhash64("w"))
    )
    aggs = [
        F.sum(F.shiftright("h", j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
        for j in range(_SIMHASH_BITS)
    ]
    per_bit = words.groupBy("doc_id").agg(*aggs)
    fingerprint = None
    for j in range(_SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return per_bit.select("doc_id", fingerprint.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3, text_col: str = "text") -> DataFrame:
    """Pairs with Hamming distance ≤ ``max_hamming`` between SimHashes.

    Pigeonhole: split 63 bits into 4 chunks; any pair within distance 3 must
    agree exactly on ≥1 chunk → equi-join per chunk (linear candidates),
    then verify with bit_count(xor). No quadratic pass.
    """
    sh = simhash(docs, text_col)
    chunks = [(0, 16), (16, 16), (32, 16), (48, 15)]
    chunk_cols = [
        (F.shiftright("simhash", lo).bitwiseAND(F.lit((1 << width) - 1))).alias(f"c{i}")
        for i, (lo, width) in enumerate(chunks)
    ]
    tagged = sh.select("doc_id", "simhash", *chunk_cols)
    pairs = None
    for i in range(len(chunks)):
        a = tagged.alias("a")
        b = tagged.alias("b")
        p = a.join(
            b,
            (F.col(f"a.c{i}") == F.col(f"b.c{i}")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.distinct()
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )
