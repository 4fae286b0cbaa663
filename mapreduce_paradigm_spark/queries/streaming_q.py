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
    streaming_click_purchase_join,
    streaming_distinct_doc_hashes,
    streaming_hourly_event_counts,
    streaming_inverted_index,
    streaming_session_windows,
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
    "streaming_sliding_window_counts",
    oracle="""
WITH k AS (SELECT unnest(generate_series(0, 3)) AS k),
w AS (
  SELECT event_type,
         make_timestamp(CAST((floor(epoch(ts) / 900) * 900 - k.k * 900) * 1000000 AS BIGINT))
           AS wstart
  FROM events, k
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n
FROM w
GROUP BY 1, 2
""",
    description="Sliding windows (1h width, 15min slide) maintained as "
    "streaming state via availableNow; every event updates 4 overlapping "
    "windows — must hash-match the batch sliding-window oracle "
    "(streaming/batch parity for overlapping-window state).",
    tags=("streaming", "window", "events"),
)
def q_streaming_sliding_window_counts(spark, sf_dir):
    from mapreduce_paradigm_spark.streaming import _stream_table

    ev = _stream_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )
    return run_to_memory(agg)


@register(
    "streaming_session_windows",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
  FROM tagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
FROM sessioned
GROUP BY user_id, session_id
""",
    description="session_window streaming aggregation (30-min gap) run via "
    "availableNow; must hash-match the batch gap-sessionization oracle "
    "(half-open interval => new session at gap >= 30 min; end = last+gap).",
    tags=("streaming", "window", "events"),
)
def q_streaming_session_windows(spark, sf_dir):
    return run_to_memory(streaming_session_windows(spark, sf_dir))


@register(
    "streaming_dedup_hashes",
    oracle="""
SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS text_hash
FROM documents
""",
    description="Streaming exact dedup via dropDuplicates state; the "
    "surviving hash set must equal the batch DISTINCT.",
    tags=("streaming", "dedup"),
)
def q_streaming_dedup_hashes(spark, sf_dir):
    return run_to_memory(streaming_distinct_doc_hashes(spark, sf_dir), output_mode="append")


@register(
    "streaming_dedup_within_watermark",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
    description="State-bounded streaming dedup (dropDuplicatesWithinWatermark): "
    "keys evict once the watermark passes their event time + 60d delay — "
    "state scales with the dedup horizon, not stream lifetime; the fixture "
    "fits one horizon so the key set equals batch DISTINCT.",
    tags=("streaming", "dedup", "events"),
)
def q_streaming_dedup_within_watermark(spark, sf_dir):
    from mapreduce_paradigm_spark.streaming import streaming_dedup_within_watermark

    return run_to_memory(
        streaming_dedup_within_watermark(spark, sf_dir), output_mode="append"
    )


@register(
    "streaming_click_purchase_join",
    oracle="""
SELECT a.event_id AS click_id, b.event_id AS purchase_id
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
""",
    description="Stream-stream inner join (same-user purchase within 1h of "
    "a click); matches emitted per micro-batch must equal the batch range "
    "join.",
    tags=("streaming", "join", "events"),
)
def q_streaming_click_purchase_join(spark, sf_dir):
    return run_to_memory(streaming_click_purchase_join(spark, sf_dir), output_mode="append")


@register(
    "streaming_click_purchase_left_outer",
    oracle="""
WITH wm AS (
  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'click'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase')) AS w
)
SELECT a.event_id AS click_id, b.event_id AS purchase_id
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
UNION ALL
SELECT a.event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id
FROM events a, wm
WHERE a.event_type = 'click'
  AND NOT EXISTS (
    SELECT 1 FROM events b
    WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
  AND a.ts + INTERVAL 1 HOUR < wm.w
""",
    description="Stream-stream LEFT OUTER join with watermark-driven state "
    "eviction: matches emit on arrival; a click emits null-extended ONLY "
    "once the global watermark (min of both sides) passes the end of its "
    "1h match window — 'no match' is decided by watermark progress, never "
    "by stream end, so clicks still matchable at end-of-stream stay in "
    "state unemitted. The oracle applies the identical cut: batch left "
    "join UNION unmatched clicks with ts + 1h < min(max click ts, max "
    "purchase ts). This pins the eviction boundary, not just the join.",
    tags=("streaming", "join", "events"),
)
def q_streaming_click_purchase_left_outer(spark, sf_dir):
    from mapreduce_paradigm_spark.streaming import streaming_click_purchase_left_outer

    return run_to_memory(
        streaming_click_purchase_left_outer(spark, sf_dir), output_mode="append"
    )


@register(
    "streaming_incremental_index_fb",
    oracle=DUCK_WORDS
    + """
SELECT word,
       array_to_string(list_sort(list(DISTINCT doc_id)), ' ') AS doc_ids,
       count(DISTINCT doc_id) AS df
FROM words
GROUP BY word
""",
    description="foreachBatch incremental index maintenance: each "
    "micro-batch's partial (doc, word) pairs merge into a parquet state "
    "table (the reference's commutative posting union, src/main.cpp:119-128, "
    "as read-union-regroup-swap); the index rebuilt FROM STATE must "
    "hash-match the flagship oracle.",
    bench=True,
    tags=("streaming", "text", "flagship"),
)
def q_streaming_incremental_index_fb(spark, sf_dir):
    import tempfile

    from mapreduce_paradigm_spark.streaming import incremental_index_foreachbatch

    state_dir = tempfile.mkdtemp(prefix="incr_index_state_") + "/state"
    incremental_index_foreachbatch(spark, sf_dir, state_dir)
    pairs = spark.read.parquet(state_dir)
    return (
        pairs.groupBy("word")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .select(
            "word",
            F.array_join("ids", " ").alias("doc_ids"),
            F.size("ids").cast("long").alias("df"),
        )
    )


# NOTE: transform_with_state_user_types (the Spark 4 processor-based
# stateful API) is implemented in streaming/__init__.py but NOT registered:
# transformWithStateInPandas requires a working google.protobuf, absent in
# this container. applyInPandasWithState below is the registered stateful
# surface; the TWS operator is import-gated for environments that have it.


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


@register(
    "streaming_continuous_rollup_fb",
    oracle="""
SELECT 'minute' AS grain, date_trunc('minute', ts) AS g,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val
FROM events GROUP BY 2
UNION ALL
SELECT 'hour', date_trunc('hour', ts), CAST(count(*) AS BIGINT),
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
FROM events GROUP BY 2
UNION ALL
SELECT 'day', date_trunc('day', ts), CAST(count(*) AS BIGINT),
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
FROM events GROUP BY 2
""",
    description="Streaming continuous aggregate: foreachBatch upserts "
    "per-batch minute-grain integer-micros partials into a parquet state "
    "table (read-union-regroup-swap); hour and day grains re-aggregate "
    "the FINAL minute state batch-side. Hash-matching the direct batch "
    "oracle proves the upsert partials commute across arbitrary "
    "micro-batch splits — the streaming half of events_multigrain_rollup.",
    tags=("streaming", "rollup", "events"),
)
def q_streaming_continuous_rollup_fb(spark, sf_dir):
    import tempfile

    from mapreduce_paradigm_spark.streaming import (
        continuous_minute_rollup_foreachbatch,
    )

    state_dir = tempfile.mkdtemp(prefix="roll_state_") + "/state"
    continuous_minute_rollup_foreachbatch(spark, sf_dir, state_dir)
    minute = spark.read.parquet(state_dir)
    hour = minute.groupBy(F.date_trunc("hour", "g").alias("g")).agg(
        F.sum("n").alias("n"), F.sum("micros").alias("micros")
    )
    day = hour.groupBy(F.date_trunc("day", "g").alias("g")).agg(
        F.sum("n").alias("n"), F.sum("micros").alias("micros")
    )

    def out(df, grain):
        return df.select(
            F.lit(grain).alias("grain"),
            "g",
            "n",
            (F.col("micros").cast("decimal(24,6)") / F.lit(1000000))
            .cast("double")
            .alias("val"),
        )

    return out(minute, "minute").unionAll(out(hour, "hour")).unionAll(
        out(day, "day")
    )


@register(
    "streaming_static_enrichment_join",
    oracle="""
WITH tiers AS (
  SELECT c AS tier_id, 'tier_' || CAST(c AS VARCHAR) AS tier_name
  FROM range(10) t(c)
)
SELECT tier_name,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events JOIN tiers ON user_id % 10 = tier_id
GROUP BY tier_name
""",
    description="Stream-static enrichment join: the event stream joins a "
    "STATIC dimension table (user tier) inside the streaming query — the "
    "standard fact-stream × slowly-changing-dim shape. The static side "
    "is planned as a broadcast against every micro-batch (no streaming "
    "state involved, unlike a stream-stream join); final complete-mode "
    "aggregate hash-matches the batch join oracle. Integer-micros sums "
    "keep the parity exact across any micro-batch split.",
    tags=("streaming", "join", "events"),
)
def q_streaming_static_enrichment_join(spark, sf_dir):
    from mapreduce_paradigm_spark.streaming import _stream_table

    tiers = spark.range(10).select(
        F.col("id").alias("tier_id"),
        F.concat(F.lit("tier_"), F.col("id").cast("string")).alias("tier_name"),
    )
    ev = _stream_table(spark, sf_dir, "events")
    enriched = ev.join(
        F.broadcast(tiers), F.pmod("user_id", F.lit(10)) == F.col("tier_id")
    )
    agg = enriched.groupBy("tier_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 1e6, 0).cast("long"))
            .cast("decimal(24,6)")
            / F.lit(1000000)
        )
        .cast("double")
        .alias("total_value"),
    )
    return run_to_memory(agg, output_mode="complete")


@register(
    "streaming_cdc_keep_latest_fb",
    oracle="""
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
""",
    description="Streaming CDC upsert: foreachBatch keep-latest-per-key "
    "merge into a parquet state table (re-rank state ∪ batch under the "
    "total order ts desc, event_id desc; atomic swap). Keep-latest is an "
    "associative max-by, so the final state hash-matches the batch "
    "keep-latest oracle regardless of micro-batch splits — the "
    "streaming twin of events_keep_latest_per_user_type.",
    tags=("streaming", "cdc", "events"),
)
def q_streaming_cdc_keep_latest_fb(spark, sf_dir):
    import tempfile

    from mapreduce_paradigm_spark.streaming import (
        cdc_keep_latest_foreachbatch,
    )

    state_dir = tempfile.mkdtemp(prefix="cdc_state_") + "/state"
    cdc_keep_latest_foreachbatch(spark, sf_dir, state_dir)
    return spark.read.parquet(state_dir).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


@register(
    "streaming_user_totals_multibatch",
    oracle="""
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
""",
    description="The applyInPandasWithState running-totals operator under "
    "a GENUINE multi-micro-batch run: the event table restages into 4 "
    "files streamed one per trigger, so per-user state must survive the "
    "state store across 4 separate batches and keep accumulating — the "
    "property the single-file availableNow sources (one batch) verify "
    "only vacuously. Final state still hash-matches the batch aggregate "
    "because the state update is integer-micros addition (commutative, "
    "batching-independent); a float accumulator would drift with the "
    "batch split. This is the registry's direct evidence that streaming "
    "state semantics — not just streaming plumbing — are correct.",
    tags=("streaming", "stateful", "events"),
)
def q_streaming_user_totals_multibatch(spark, sf_dir):
    from mapreduce_paradigm_spark.streaming import (
        _stream_table_chunked,
        stateful_user_totals,
    )

    src = _stream_table_chunked(spark, sf_dir, "events", n_chunks=4)
    updates = run_to_memory(
        stateful_user_totals(spark, sf_dir, source=src), output_mode="update"
    )
    # update mode emits one row per (user, batch); keep the final state
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "streaming_cdc_keep_latest_multibatch",
    oracle="""
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
""",
    description="The CDC keep-latest upsert under a REAL 4-micro-batch "
    "change log (restaged files, one per trigger): the state table is "
    "genuinely merged 4 times — each batch's per-key champion re-ranked "
    "against persisted state, atomic swap each time — and the final "
    "state must still hash-match the batch keep-latest oracle. The "
    "single-batch form (streaming_cdc_keep_latest_fb) proves the merge "
    "CODE runs; this one proves the merge is actually associative/"
    "commutative under an arbitrary split of the log, which is the "
    "whole correctness claim of incremental upsert compaction.",
    tags=("streaming", "cdc", "events"),
)
def q_streaming_cdc_keep_latest_multibatch(spark, sf_dir):
    import tempfile

    from mapreduce_paradigm_spark.streaming import (
        _stream_table_chunked,
        cdc_keep_latest_foreachbatch,
    )

    src = _stream_table_chunked(spark, sf_dir, "events", n_chunks=4)
    state_dir = tempfile.mkdtemp(prefix="cdc_state_mb_") + "/state"
    cdc_keep_latest_foreachbatch(spark, sf_dir, state_dir, source=src)
    return spark.read.parquet(state_dir).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


@register(
    "streaming_pit_enrichment",
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
         lag(o_orderstatus) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev_status
  FROM orders
),
scd2 AS (
  SELECT o_custkey AS custkey,
         o_orderstatus AS status,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS valid_to
  FROM ordered
  WHERE prev_status IS NULL OR prev_status <> o_orderstatus
),
shipped AS (
  SELECT o.o_custkey AS custkey, l.l_shipdate,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0)
              AS BIGINT) AS rev_micro
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT d.status AS status_at_ship,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(s.rev_micro) AS BIGINT) AS rev_micro
FROM shipped s
JOIN scd2 d ON s.custkey = d.custkey
           AND s.l_shipdate >= d.valid_from
           AND (d.valid_to IS NULL OR s.l_shipdate < d.valid_to)
GROUP BY d.status
""",
    description="STREAMING point-in-time enrichment: the shipment stream "
    "joins the static SCD2 status dimension on custkey with the "
    "[valid_from, valid_to) interval as residual predicate — the "
    "stream-static NON-EQUI join (enrichment against a versioned "
    "dimension, not just a current snapshot), then a running status "
    "rollup maintained as streaming state. Must hash-match the batch "
    "PIT oracle (lineitem_pit_customer_status's aggregate): time-travel "
    "correctness is preserved under micro-batched execution because the "
    "dimension is static per batch and the aggregate state is "
    "commutative. At scale the dimension broadcasts once per batch.",
    tags=("streaming", "warehouse", "scd", "join"),
)
def q_streaming_pit_enrichment(spark, sf_dir):
    from mapreduce_paradigm_spark.registry import all_specs
    from mapreduce_paradigm_spark.sources.tables import load_table
    from mapreduce_paradigm_spark.streaming import _stream_table

    scd2 = all_specs()["customer_status_scd2"].builder(spark, sf_dir).select(
        "custkey", "status", "valid_from", "valid_to"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l_stream = _stream_table(spark, sf_dir, "lineitem")
    shipped = l_stream.join(o, l_stream.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("s_custkey"),
        "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6, 0)
        .cast("long")
        .alias("rev_micro"),
    )
    pit = shipped.join(
        scd2,
        (F.col("s_custkey") == F.col("custkey"))
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
    )
    agg = pit.groupBy(F.col("status").alias("status_at_ship")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("rev_micro").alias("rev_micro"),
    )
    return run_to_memory(agg, output_mode="complete")


@register(
    "streaming_value_tdigest",
    oracle=None,  # sketch state ≠ SQL; accuracy + state-accumulation pinned
    # in tests/test_sketches.py against the exact distribution
    description="t-digest quantile sketch maintained as STREAMING STATE "
    "(applyInPandasWithState with centroid-array state, not counters): "
    "each micro-batch folds into the stored digest under the same k1 "
    "compression as the batch operator, so state stays ≤ ~100 centroids "
    "however long the stream runs — bounded-state percentile monitoring "
    "on an unbounded stream. Runs over a real 4-file chunked source "
    "(state must survive micro-batches); emits per-batch digest "
    "summaries, final rank error ≤ 1% pinned in pytest.",
    tags=("streaming", "statistics", "sketch", "approx"),
)
def q_streaming_value_tdigest(spark, sf_dir):
    from mapreduce_paradigm_spark.streaming import streaming_value_tdigest

    out = run_to_memory(streaming_value_tdigest(spark, sf_dir), output_mode="update")
    return out.select("k", "n_centroids", "total_weight")


@register(
    "streaming_click_purchase_full_outer",
    oracle="""
WITH wm AS (
  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'click'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase')) AS w
)
SELECT a.event_id AS click_id, b.event_id AS purchase_id
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
UNION ALL
SELECT a.event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id
FROM events a, wm
WHERE a.event_type = 'click'
  AND NOT EXISTS (
    SELECT 1 FROM events b
    WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
  AND a.ts + INTERVAL 1 HOUR < wm.w
UNION ALL
SELECT CAST(NULL AS BIGINT) AS click_id, b.event_id AS purchase_id
FROM events b, wm
WHERE b.event_type = 'purchase'
  AND NOT EXISTS (
    SELECT 1 FROM events a
    WHERE a.user_id = b.user_id AND a.event_type = 'click'
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
  AND b.ts < wm.w
""",
    description="Stream-stream FULL OUTER join with per-side watermark "
    "eviction — the completion of the inner/left-outer pair: matches "
    "emit on arrival; null-extension is decided per side by its own "
    "event-time bound (a click once the watermark passes c_ts + 1h, a "
    "purchase once it passes p_ts — the purchase's last matchable click "
    "is at p_ts, so its window closes earlier). The oracle applies "
    "exactly those two asymmetric cuts in batch SQL, so both eviction "
    "boundaries — not just the join — are hash-pinned. Rows whose "
    "windows are open at end-of-stream stay in state unemitted on both "
    "sides.",
    tags=("streaming", "join", "events"),
)
def q_streaming_click_purchase_full_outer(spark, sf_dir):
    from mapreduce_paradigm_spark.streaming import (
        streaming_click_purchase_full_outer,
    )

    return run_to_memory(
        streaming_click_purchase_full_outer(spark, sf_dir), output_mode="append"
    )
