"""Inverted-index operators — the reference's flagship pipeline, Spark-first.

Reference pipeline (/root/reference/src/main.cpp): tokenize (239-242) →
filterWord normalize (191-208) → drop-empty (247) → per-doc dedup (247-249) →
per-doc partial maps (234-258, the combiner) → pairwise merge with sorted
posting lists (104-142) → 26-way first-letter partition (55-79) → sort df
desc, word asc (83-91) → ``word:[i1 i2 …]`` text files (161-179).

Spark realization: the partial-aggregate/merge machinery is Spark's own
partial+final HashAggregate around one shuffle on ``word`` — no user code.
``distinct → groupBy(word) → sort_array(collect_set(doc_id))`` reproduces the
exact semantics including cross-doc posting dedup and ascending order.

Scale notes (100 TB): the only unbounded state is the posting list of
stop-word-like terms. ``inverted_index(max_postings=…)`` bounds it via
``slice``; the lossless scale form is ``postings()`` — the normalized
``(word, doc_id)`` relation, which needs no per-key array at all and is what
downstream joins should consume. The per-letter split the reference uses as
skew mitigation maps to ``letter`` partition pruning here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_paradigm_spark.functions import doc_words, first_letter


def postings(docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id") -> DataFrame:
    """Normal-form inverted index: distinct ``(word, doc_id)`` pairs.

    This is the O6 per-document dedup (src/main.cpp:247-249) generalized:
    Spark's partial aggregation performs the map-side half before the
    shuffle, exactly like the reference's per-doc maps.
    """
    return doc_words(docs, text_col, doc_id_col).distinct()


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    max_postings: int | None = None,
) -> DataFrame:
    """Full index: ``(word, doc_ids ARRAY<...> ascending, df BIGINT)``.

    ``df`` (document frequency) is the reference's posting-list size used for
    output ordering (src/main.cpp:83-91). ``max_postings`` bounds per-word
    array state for web-scale corpora (df stays exact: computed pre-slice).

    Single-shuffle plan: ``collect_set`` already deduplicates — map-side in
    the partial aggregate (the reference's per-doc maps, src/main.cpp:234-258)
    and again in the final merge — so neither a pre-``distinct()`` nor
    ``count_distinct`` (which would add a second Exchange via the
    distinct-aggregate rewrite) is needed; df is the set size.
    """
    idx = (
        doc_words(docs, text_col, doc_id_col)
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("doc_ids"))
        .withColumn("df", F.size("doc_ids").cast("long"))
    )
    if max_postings is not None:
        idx = idx.withColumn("doc_ids", F.slice("doc_ids", 1, max_postings))
    return idx


def index_with_letter(index: DataFrame) -> DataFrame:
    """O9: add the first-letter partition column (src/main.cpp:55-79)."""
    return index.withColumn("letter", first_letter("word"))


def positional_postings(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """``(word, doc_id, positions)`` — the positional generalization of the
    flagship index: positions are 0-based offsets into the RAW whitespace
    token sequence (src/main.cpp:239-242's tokenization), recorded before
    normalization drops empty tokens, so adjacency (pos+1) is meaningful
    for phrase queries. One shuffle: groupBy(word, doc) collects sorted
    position arrays with map-side partial aggregation."""
    from mapreduce_paradigm_spark.functions import normalized_word, tokens

    pos_words = (
        docs.select(
            F.col(doc_id_col).alias("doc_id"),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
        )
        .select("doc_id", "pos", normalized_word(F.col("token")).alias("word"))
        .filter(F.length("word") > 0)
    )
    return pos_words.groupBy("word", "doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def phrase_match(
    docs: DataFrame,
    first_word: str,
    second_word: str,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Documents containing the exact two-word phrase: positional postings
    of both words joined per doc, matched on adjacency (second at pos+1)
    via ``arrays_overlap`` of shifted positions — array-side, no explode of
    the position lists into a row join."""
    p = positional_postings(docs, text_col, doc_id_col)
    a = p.filter(F.col("word") == first_word).select(
        "doc_id", F.col("positions").alias("pa")
    )
    b = p.filter(F.col("word") == second_word).select(
        "doc_id", F.col("positions").alias("pb")
    )
    shifted = F.transform(F.col("pa"), lambda x: x + 1)
    return (
        a.join(b, "doc_id")
        .filter(F.arrays_overlap(shifted, F.col("pb")))
        .select("doc_id")
    )


def letter_ranked(index: DataFrame) -> DataFrame:
    """O10 as a window: rank words within each letter by df desc, word asc
    (the reference's comparator, src/main.cpp:83-91).

    The window shuffles on ``letter`` only (26-way); at scale the rank is
    computed after the letter repartition the sink needs anyway, so it is
    shuffle-free in the combined plan.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("letter").orderBy(F.desc("df"), F.asc("word"))
    return index_with_letter(index).withColumn(
        "rank_in_letter", F.row_number().over(w).cast("long")
    )
