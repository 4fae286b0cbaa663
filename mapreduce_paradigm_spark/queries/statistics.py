"""Round-3 batch 8: statistical & geo analytics.

Higher-moment statistics from exact integer power sums (hash-stable
skewness without trusting cross-engine ``skewness()`` definitions),
reorder-interval distributions, month-over-month growth, and a haversine
nearest-neighbor assignment — the remaining everyday analytics shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_paradigm_spark.functions import dsum
from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import load_table

# --- exact integer moments → skewness ----------------------------------------


@register(
    "quantity_moment_stats",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n, s1, s2, s3,
       round(CAST(s1 AS DOUBLE) / n, 6) AS mean_qty,
       round(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 6) AS var_qty,
       round(
         (CAST(s3 AS DOUBLE) / n
          - 3 * (CAST(s1 AS DOUBLE) / n)
              * (CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
         / power(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1.5),
         6) AS skew_qty
FROM s
""",
    description="Population mean/variance/skewness per return flag from "
    "EXACT integer power sums (l_quantity is integral, so Σq, Σq², Σq³ "
    "are exact BIGINTs — order-independent, overflow-guarded by ANSI): "
    "the moments are assembled into floats once per GROUP by one "
    "deterministic double formula, rather than trusting two engines' "
    "`skewness()` aggregates to share a definition (population vs sample "
    "correction) or a summation order. The raw sums are in the output — "
    "at 100 TB they are also exactly mergeable across shards, the same "
    "partial-aggregate argument as the micros sums.",
    tags=("agg", "statistics"),
)
def q_quantity_moment_stats(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    m3 = F.col("s3").cast("double") / F.col("n")
    var = m2 - m1 * m1
    skew = (m3 - 3 * m1 * var - m1 * m1 * m1) / F.pow(var, 1.5)
    return s.select(
        "l_returnflag",
        "n",
        "s1",
        "s2",
        "s3",
        F.round(m1, 6).alias("mean_qty"),
        F.round(var, 6).alias("var_qty"),
        F.round(skew, 6).alias("skew_qty"),
    )


# --- reorder-interval distribution -------------------------------------------


@register(
    "customer_reorder_gaps",
    oracle="""
WITH seq AS (
  SELECT o_custkey,
         datediff('day',
                  lag(o_orderdate) OVER (
                      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
  FROM orders
)
SELECT CAST(gap_days // 30 AS BIGINT) AS gap_month_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_days) AS BIGINT) AS min_days,
       CAST(max(gap_days) AS BIGINT) AS max_days
FROM seq WHERE gap_days IS NOT NULL
GROUP BY 1
""",
    description="Reorder-interval distribution: days between consecutive "
    "orders per customer (lag over the per-customer date order, tie-"
    "broken by orderkey) bucketed into 30-day bands — the inter-arrival "
    "histogram behind churn/repurchase models. One window shuffle on "
    "custkey, then an aggregation over gap buckets; integer day "
    "arithmetic end-to-end.",
    tags=("analytics", "window", "orders"),
)
def q_customer_reorder_gaps(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    )
    return (
        seq.filter(F.col("gap_days").isNotNull())
        .groupBy(
            F.expr("CAST(gap_days DIV 30 AS BIGINT)").alias("gap_month_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").cast("long").alias("min_days"),
            F.max("gap_days").cast("long").alias("max_days"),
        )
    )


# --- month-over-month growth -------------------------------------------------


@register(
    "monthly_revenue_growth",
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS om,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT strftime(om, '%Y-%m') AS order_month, revenue,
       round(revenue / lag(revenue) OVER (ORDER BY om) - 1, 6) AS mom_growth
FROM m
""",
    description="Month-over-month growth: exact-micros monthly revenue "
    "plus a lag-ratio window. The unpartitioned ORDER BY window is safe "
    "HERE because it runs over the aggregated month spine (≲ thousands "
    "of rows however big the input) — the general rule stands: global "
    "windows belong AFTER aggregation, never on the raw fact table.",
    tags=("analytics", "window", "orders"),
)
def q_monthly_revenue_growth(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("om")
    ).agg(dsum(F.col("o_totalprice"), "revenue"))
    w = Window.orderBy("om")
    return m.select(
        F.date_format("om", "yyyy-MM").alias("order_month"),
        "revenue",
        F.round(
            F.col("revenue") / F.lag("revenue").over(w) - 1, 6
        ).alias("mom_growth"),
    )


# --- haversine nearest warehouse ---------------------------------------------

_WAREHOUSES = [  # (id, lat, lon) — fixed literal sites
    (0, 40.71, -74.0),
    (1, 51.51, -0.13),
    (2, 35.68, 139.69),
    (3, -33.87, 151.21),
]


@register(
    "customer_nearest_warehouse",
    oracle=f"""
WITH c AS (
  SELECT c_custkey,
         (CAST(c_custkey * 7 % 17000 AS DOUBLE) / 100.0) - 85.0 AS lat,
         (CAST(c_custkey * 13 % 36000 AS DOUBLE) / 100.0) - 180.0 AS lon
  FROM customer
),
w(w_id, w_lat, w_lon) AS (
  VALUES {", ".join(f"({i}, {la}, {lo})" for i, la, lo in _WAREHOUSES)}
),
d AS (
  SELECT c_custkey, CAST(w_id AS BIGINT) AS w_id,
         2 * 6371.0 * asin(sqrt(
             power(sin(radians(w_lat - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(w_lat))
               * power(sin(radians(w_lon - lon) / 2), 2)
         )) AS dist_km
  FROM c CROSS JOIN w
),
r AS (
  SELECT c_custkey, w_id, dist_km,
         row_number() OVER (
             PARTITION BY c_custkey ORDER BY dist_km, w_id) AS rn
  FROM d
)
SELECT c_custkey, w_id, round(dist_km, 4) AS dist_km
FROM r WHERE rn = 1
""",
    description="Haversine nearest-warehouse assignment: deterministic "
    "customer coordinates (integer-derived, exact doubles), a 4-row "
    "warehouse table broadcast, great-circle distance per pair, argmin "
    "via a per-customer window (tie-broken by warehouse id) — the "
    "geo-assignment shape (closest depot / region / PoP). The small side "
    "is a broadcast nested-loop cross join: K·N rows scanned once, no "
    "shuffle of the customer table beyond the argmin window; at scale "
    "replace the cross join with a spatial grid bucket join (same "
    "argmin tail). Trig runs in float64 in both engines; only the "
    "rounded distance is output.",
    tags=("geo", "join", "customer"),
)
def q_customer_nearest_warehouse(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    c = cust.select(
        "c_custkey",
        (F.pmod(F.col("c_custkey") * 7, F.lit(17000)).cast("double") / 100.0
         - 85.0).alias("lat"),
        (F.pmod(F.col("c_custkey") * 13, F.lit(36000)).cast("double") / 100.0
         - 180.0).alias("lon"),
    )
    w = spark.createDataFrame(_WAREHOUSES, "w_id long, w_lat double, w_lon double")
    dist = (
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("w_lat") - F.col("lat")) / 2), 2)
                + F.cos(F.radians("lat"))
                * F.cos(F.radians("w_lat"))
                * F.pow(
                    F.sin(F.radians(F.col("w_lon") - F.col("lon")) / 2), 2
                )
            )
        )
    )
    d = c.crossJoin(F.broadcast(w)).select(
        "c_custkey", "w_id", dist.alias("dist_km")
    )
    rn = F.row_number().over(
        Window.partitionBy("c_custkey").orderBy("dist_km", "w_id")
    )
    return (
        d.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("c_custkey", "w_id", F.round("dist_km", 4).alias("dist_km"))
    )
