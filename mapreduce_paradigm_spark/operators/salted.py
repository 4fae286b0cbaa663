"""Skew-salted aggregation: the two-phase pattern for hot keys.

The reference's per-letter output split (/root/reference/src/main.cpp:55-94)
is itself a hand-rolled skew mitigation — fan one huge sorted map out into 26
independently-processed chunks. The general Spark form is salting: append a
salt to the group key, aggregate (key, salt) — spreading a hot key's partial
states over ``buckets`` reducers — then aggregate away the salt.

When it pays: aggregates with heavy per-group state (``collect_set``,
``collect_list``, big sketches) under Zipfian keys — stop words in the
inverted index hold postings for nearly every document, so a single reducer
would otherwise receive almost the whole corpus for those few keys. For tiny
states (counts/sums) AQE's skew handling usually suffices; the pattern is
registered on term frequency because the result is oracle-checkable while
the mechanics are identical for the heavy case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    key_cols: list[str],
    buckets: int = 16,
    alias: str = "n",
) -> DataFrame:
    """Two-phase count: ``groupBy(keys, salt).count`` → ``groupBy(keys).sum``.

    Salt = input partition id mod ``buckets``: deterministic per task (safe
    under retries/speculation), no per-row randomness, and rows of a hot key
    land on up to ``buckets`` distinct reducers in phase 1. Phase 2 moves
    only ``buckets`` partial rows per key. Result is exactly ``groupBy(
    keys).count()`` — counts are associative, the split is invisible.
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_pc"))
    return partial.groupBy(*key_cols).agg(F.sum("_pc").alias(alias))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """General form for any algebraic aggregate: caller supplies the partial
    aggregates (over ``(keys, salt)``) and the matching final re-aggregates
    (over ``keys``); e.g. sum→sum, count→sum, min→min, collect_set→
    flatten+array_distinct."""
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    buckets: int = 8,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-salted equi-join: spread a hot join key over ``buckets``
    reducers by salting the BIG side (deterministic ``xxhash64`` of
    ``salt_src``, default the key itself plus partition id is avoided —
    retries must re-derive the same salt) and replicating the SMALL side
    once per salt value, then joining on ``(key, salt)``. A key whose rows
    previously all landed on one reducer now spreads across ``buckets``
    tasks; the small side grows ×buckets (it must be small enough to
    replicate, yet too big / too dynamic to broadcast — exactly the gap
    this pattern fills between broadcast joins and AQE skew splitting,
    which only kicks in above its partition-size thresholds).

    Result is exactly ``big.join(small, key)``: salting is invisible to
    the join semantics because every (key, salt) pair on the big side
    finds the replicated small row with that same salt. Registered with a
    plain-join oracle so the equivalence is hash-certified.

    Salt derivation: hash of the FULL big-side row content by default
    (``salt_src`` names a single column to hash instead, e.g. a row id).
    It must NOT be a function of the join key alone — all rows of the hot
    key would then share one salt value and still land on one reducer, a
    silent no-op mitigation — and must not use ``spark_partition_id``/
    ``rand``, which change under retries and speculative execution. A
    row-content hash is both: deterministic per row, spreading per key.
    """
    if salt_src is not None:
        src_cols = [F.col(salt_src)]
    else:
        src_cols = [F.col(c) for c in big.columns]
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*src_cols), F.lit(buckets)).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    if big_key == small_key:
        # same-name keys: an expression condition would be ambiguous; the
        # on-list join also merges the key and salt columns like a plain
        # string-key join would
        return b.join(s, [big_key, "_salt"]).drop("_salt")
    return b.join(
        s,
        (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
    ).drop("_salt")
