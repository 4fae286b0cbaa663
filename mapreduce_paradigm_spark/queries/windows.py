"""Window functions, sessionization, range join, as-of join (SURVEY.md §2.B).

The reference's only ordering construct is the global df-desc/word-asc sort
(src/main.cpp:83-91); these generalize it to rank/lag/frames/sessionization
over the ``events`` stream table, plus the two time-join shapes Spark lacks
as named operators (range join, as-of join) composed from built-ins.

Hash-stability: window sums go through DECIMAL casts (see registry notes);
timestamps compare as naive values on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_paradigm_spark.functions import dsum, dsum_over
from mapreduce_paradigm_spark.operators.asof import asof_join
from mapreduce_paradigm_spark.operators.sessionize import sessionize
from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import load_table


@register(
    "orders_rank_per_customer",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(rank() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS price_rank
FROM orders
""",
    description="rank() per customer by order value, deterministic tie-break.",
    bench=True,
    tags=("window",),
)
def q_orders_rank_per_customer(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("price_rank"),
    )


@register(
    "events_running_sum",
    oracle="""
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_value
FROM events
""",
    description="Running per-user sum (unbounded-preceding frame); decimal "
    "accumulation keeps it engine-exact.",
    tags=("window", "events"),
)
def q_events_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        dsum_over(F.col("value"), w).alias("running_value"),
    )


@register(
    "events_moving_avg",
    oracle="""
SELECT event_id, user_id,
       CAST(sum(CAST(value AS DECIMAL(18,6)))
            OVER w AS DOUBLE) / count(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    description="Sliding 3-row mean per user (bounded frame).",
    tags=("window", "events"),
)
def q_events_moving_avg(spark, sf_dir):
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-2, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (dsum_over(F.col("value"), w) / F.count(F.lit(1)).over(w)).alias("moving_avg"),
    )


@register(
    "events_lag_lead",
    oracle="""
SELECT event_id, user_id, event_type,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       value - lag(value) OVER w AS value_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    description="lag/lead navigation within the per-user timeline.",
    tags=("window", "events"),
)
def q_events_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


@register(
    "orders_ranking_suite",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(dense_rank()   OVER w AS BIGINT) AS drnk,
       CAST(ntile(4)       OVER w AS BIGINT) AS quartile,
       percent_rank()      OVER w AS prnk,
       first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS first_ok,
       last_value(o_orderkey)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS last_ok
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
    description="Full ranking-function suite per customer: dense_rank, "
    "ntile, percent_rank, first/last value with explicit frames (unique "
    "order key → deterministic across engines).",
    tags=("window",),
)
def q_orders_ranking_suite(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.first("o_orderkey").over(wfull).alias("first_ok"),
        F.last("o_orderkey").over(wfull).alias("last_ok"),
    )


@register(
    "quantity_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5)  AS median_qty,
       quantile_cont(l_quantity, 0.95) AS p95_qty,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
""",
    description="Exact linear-interpolation percentiles (Spark `percentile` "
    "== DuckDB `quantile_cont`); the approx_percentile sketch is the scale "
    "path when exactness isn't required.",
    bench=True,
    tags=("aggregation", "percentile"),
)
def q_quantity_percentiles(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.percentile("l_quantity", 0.95).alias("p95_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


@register(
    "user_value_trend",
    oracle="""
WITH t AS (
  SELECT user_id, value,
         (epoch(ts) - min(epoch(ts)) OVER (PARTITION BY user_id)) / 3600.0 AS xh
  FROM events
)
SELECT user_id, count(*) AS n_events,
       round(regr_slope(value, xh), 6) AS slope
FROM t
GROUP BY user_id
HAVING count(*) >= 2 AND var_pop(xh) > 0
""",
    description="Grouped-map applyInPandas: per-user least-squares value "
    "trend (cov/var with centered x == SQL regr_slope); each user group is "
    "one Arrow batch on an executor (operators/grouped.py).",
    tags=("pandas", "events", "regression"),
)
def q_user_value_trend(spark, sf_dir):
    from mapreduce_paradigm_spark.operators.grouped import user_value_trend

    return user_value_trend(load_table(spark, sf_dir, "events"))


@register(
    "sessionize_30min",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
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
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
FROM sessioned
GROUP BY user_id, session_id
""",
    description="Gap-based sessionization (30 min) — custom stateful operator "
    "composed from two window passes + aggregate; one shuffle on user_id.",
    bench=True,
    tags=("window", "sessionize", "events"),
)
def q_sessionize_30min(spark, sf_dir):
    ev = sessionize(load_table(spark, sf_dir, "events"))
    return ev.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum(F.col("value"), "session_value"),
    )


@register(
    "click_purchase_within_hour",
    oracle="""
SELECT a.event_id AS click_id,
       count(b.event_id) AS n_purchases,
       CAST(sum(CAST(b.value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.event_type = 'purchase'
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'click'
GROUP BY a.event_id
""",
    description="Range (interval) join: purchases within 1h after each click. "
    "Planned as an equi-join on user_id with the time range as residual "
    "filter — no cartesian blowup; AQE handles per-user skew.",
    bench=True,
    tags=("join", "range", "events"),
)
def q_click_purchase_within_hour(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("a_user"), F.col("event_id").alias("click_id"), F.col("ts").alias("a_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"), F.col("value").alias("b_value"),
    )
    joined = clicks.join(
        purchases,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy("click_id").agg(
        F.count("b_id").alias("n_purchases"),
        dsum(F.col("b_value"), "purchase_value"),
    )


@register(
    "last_click_before_view",
    oracle="""
SELECT a.event_id, a.user_id,
       (SELECT max(b.ts) FROM events b
        WHERE b.user_id = a.user_id AND b.event_type = 'click' AND b.ts < a.ts)
       AS asof_ts
FROM events a
WHERE a.event_type = 'view'
""",
    description="As-of join (strictly earlier) composed as union-tag + window "
    "last(ignorenulls) — single shuffle, no per-row subquery "
    "(operators/asof.py).",
    tags=("join", "asof", "events"),
)
def q_last_click_before_view(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .withColumn("click_ts", F.col("ts"))
    )
    out = asof_join(
        views, clicks, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["click_ts"]
    )
    return out.select("event_id", "user_id", F.col("asof_click_ts").alias("asof_ts"))


@register(
    "events_sliding_window_counts",
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
    description="BATCH sliding windows (1h width, 15min slide, epoch-"
    "aligned): every event lands in exactly 4 overlapping windows — the "
    "window() table function outside streaming.",
    tags=("window", "events", "datetime"),
)
def q_events_sliding_window_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


@register(
    "sessionize_native_session_window",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
  FROM tagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS window_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessioned
GROUP BY user_id, session_id
""",
    description="Gap sessionization via Spark's NATIVE batch "
    "session_window() aggregate — the built-in form of the two-window "
    "custom operator (sessionize_30min): one groupBy, Spark merges "
    "overlapping per-event candidate windows internally (window.start = "
    "first event, window.end = last event + gap). Boundary semantics "
    "differ from the custom operator at EXACTLY gap==30min: session "
    "windows are half-open [start, end), so an event landing on the "
    "boundary starts a NEW session (oracle uses >=), while the custom "
    "lag() form merges it (uses >) — the kind of off-by-inclusive that "
    "silently splits sessions; pinned here so both conventions stay "
    "deliberate. Scale: the native aggregate needs only ONE shuffle on "
    "user_id (same as the custom form) and is the path that also runs "
    "under Structured Streaming state (streaming_session_windows).",
    tags=("window", "sessionize", "events"),
)
def q_sessionize_native_session_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


@register(
    "view_nearest_click_asof",
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
)
SELECT v.event_id AS view_id, c.click_id AS nearest_click_id
FROM views v LEFT JOIN LATERAL (
  SELECT cc.event_id AS click_id
  FROM clicks cc
  WHERE cc.user_id = v.user_id
    AND abs(epoch_us(cc.ts) - epoch_us(v.ts)) <= 1800 * 1000000
  ORDER BY abs(epoch_us(cc.ts) - epoch_us(v.ts)) ASC,
           CASE WHEN cc.ts <= v.ts THEN 0 ELSE 1 END ASC,
           cc.event_id DESC
  LIMIT 1
) c ON true
""",
    description="NEAREST-as-of join (operators/asof.py asof_join_nearest): "
    "each view matched to the same-user click minimizing |Δt| within a "
    "±30 min tolerance; ties prefer the backward candidate, then the "
    "greatest value tuple (fully deterministic). Direction rule: backward "
    "is non-strict, forward strict, so an equal-timestamp click counts "
    "once. Composed from TWO window passes (ascending + descending) over "
    "one key-partitioned union — one shuffle, no range self-join; the "
    "tolerance filter and argmin are row-local. The bidirectional "
    "complement of last_click_before_view's backward-only semantics; "
    "oracle is an independent DuckDB LATERAL argmin.",
    tags=("window", "asof", "events", "join"),
)
def q_view_nearest_click_asof(spark, sf_dir):
    from mapreduce_paradigm_spark.operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    out = asof_join_nearest(
        views,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["event_id"],
        tolerance_seconds=1800,
    )
    return out.select("view_id", F.col("asof_event_id").alias("nearest_click_id"))
