"""Streaming queries exposed through the batch query contract: each runs a
Structured Streaming job to completion (availableNow → memory sink) and
returns the final state. Oracles are the BATCH equivalents — passing the
same hash gate proves streaming/batch parity, the property the reference's
commutative merge guarantees (src/main.cpp:119-128)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_paradigm_spark.queries.flagship import DUCK_WORDS
from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.streaming import (
    run_to_memory,
    stateful_user_totals,
    streaming_hourly_event_counts,
    streaming_inverted_index,
)


@register(
    "streaming_inverted_index",
    oracle=DUCK_WORDS
    + """
SELECT word,
       array_to_string(list_sort(list(DISTINCT doc_id)), ' ') AS doc_ids,
       count(DISTINCT doc_id) AS df
FROM words
GROUP BY word
""",
    description="Flagship index maintained as streaming state (availableNow "
    "micro-batches); must hash-match the batch oracle — streaming/batch "
    "parity.",
    tags=("streaming", "text"),
)
def q_streaming_inverted_index(spark, sf_dir):
    result = run_to_memory(streaming_inverted_index(spark, sf_dir))
    return result.select("word", F.array_join("doc_ids", " ").alias("doc_ids"), "df")


@register(
    "streaming_hourly_event_counts",
    oracle="""
SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n
FROM events
GROUP BY 1, 2
""",
    description="Tumbling 1h windowed counts with watermark over the event "
    "stream; epoch-aligned windows ≡ date_trunc('hour').",
    tags=("streaming", "events", "window"),
)
def q_streaming_hourly_event_counts(spark, sf_dir):
    return run_to_memory(streaming_hourly_event_counts(spark, sf_dir))


@register(
    "streaming_user_totals_stateful",
    oracle="""
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
""",
    description="applyInPandasWithState custom stateful operator: per-user "
    "running totals in explicit group state; final state must hash-match "
    "the batch aggregate (integer-micros accumulation makes it exact).",
    tags=("streaming", "stateful", "events"),
)
def q_streaming_user_totals_stateful(spark, sf_dir):
    updates = run_to_memory(stateful_user_totals(spark, sf_dir), output_mode="update")
    # update mode appends one row per (user, batch); the final state is the
    # row with the highest running count per user.
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
