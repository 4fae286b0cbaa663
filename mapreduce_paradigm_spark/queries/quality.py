"""Round-3 batch 5: data-quality checks + map higher-order functions.

``data_quality_suite`` is the deequ-style constraint scan a production
pipeline runs before training-data export: each check is a metric row, the
whole suite is ONE pass over each table (conditional aggregates, no
per-check scans). ``customer_priority_map_funcs`` exercises the map-typed
higher-order functions (map_from_entries / transform_values / map_filter /
map_entries) that the array suites don't cover.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import load_table

# --- data-quality constraint suite -------------------------------------------


@register(
    "data_quality_suite",
    oracle="""
SELECT 'orders_custkey_null' AS check_name,
       CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_bad,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
UNION ALL
SELECT 'orders_orderkey_dup',
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem_qty_range',
       CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5) AS BIGINT),
       CAST(count(*) AS BIGINT)
FROM lineitem
""",
    description="Data-quality constraint suite (deequ-style): null-rate, "
    "key-uniqueness, referential orphans, and value-range checks, each "
    "one metric row. Null/dup/range checks "
    "are conditional aggregates — ONE scan per table regardless of how "
    "many checks it carries; the referential check is a broadcast-able "
    "left join counting misses. This is the gate a 100 TB export runs "
    "before publishing a training shard: metrics land in a tiny table, "
    "alerts compare against thresholds, the scan cost is shared.",
    tags=("quality", "agg", "pipeline"),
)
def q_data_quality_suite(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def metric(name, n_bad, n_rows):
        return F.struct(
            F.lit(name).alias("check_name"),
            n_bad.cast("long").alias("n_bad"),
            n_rows.cast("long").alias("n_rows"),
        )

    o_checks = orders.agg(
        F.array(
            metric(
                "orders_custkey_null",
                F.count(F.lit(1)) - F.count("o_custkey"),
                F.count(F.lit(1)),
            ),
            metric(
                "orders_orderkey_dup",
                F.count(F.lit(1)) - F.count_distinct("o_orderkey"),
                F.count(F.lit(1)),
            ),
        ).alias("ms")
    )
    orphan = (
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.array(
                metric(
                    "lineitem_orphan_orderkey",
                    F.count(F.lit(1)) - F.count("o_orderkey"),
                    F.count(F.lit(1)),
                )
            ).alias("ms")
        )
    )
    l_checks = li.agg(
        F.array(
            metric(
                "lineitem_qty_range",
                F.sum(
                    F.when(
                        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
                    ).otherwise(0)
                ),
                F.count(F.lit(1)),
            ),
            metric(
                "lineitem_discount_range",
                F.sum(
                    F.when(
                        (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1
                    ).otherwise(0)
                ),
                F.count(F.lit(1)),
            ),
        ).alias("ms")
    )
    return (
        o_checks.unionAll(orphan)
        .unionAll(l_checks)
        .select(F.explode("ms").alias("m"))
        .select("m.check_name", "m.n_bad", "m.n_rows")
    )


# --- map higher-order functions ----------------------------------------------


@register(
    "customer_priority_map_funcs",
    oracle="""
WITH c AS (
  SELECT o_custkey, o_orderpriority AS p, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey,
       string_agg(p || '=' || CAST(n * 2 AS VARCHAR), ',' ORDER BY p) AS doubled,
       string_agg(CASE WHEN n >= 2 THEN p || '=' || CAST(n AS VARCHAR) END,
                  ',' ORDER BY p) AS frequent,
       CAST(count(*) AS BIGINT) AS n_priorities
FROM c GROUP BY o_custkey
""",
    description="Map-typed higher-order functions over a per-customer "
    "priority→count map: map_from_entries builds it from one aggregate, "
    "transform_values doubles counts, map_filter keeps the frequent "
    "entries, map_entries + sort renders both deterministically (map "
    "iteration order is NOT a contract — rendering always sorts). The "
    "oracle computes the same strings relationally (string_agg ORDER "
    "BY), proving the map pipeline equals its flat-SQL semantics. All "
    "JVM codegen; maps never leave the executors.",
    tags=("sql", "map", "orders"),
)
def q_customer_priority_map_funcs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(
        "o_custkey", F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = c.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("p", "n")))
        ).alias("m")
    )

    def render(mp):
        return F.array_join(
            F.sort_array(
                F.transform(
                    F.map_entries(mp),
                    lambda e: F.concat_ws("=", e.key, e.value.cast("string")),
                )
            ),
            ",",
        )

    doubled = F.transform_values(F.col("m"), lambda _, v: v * 2)
    frequent = F.map_filter(F.col("m"), lambda _, v: v >= 2)
    return m.select(
        "o_custkey",
        render(doubled).alias("doubled"),
        F.when(F.size(F.map_entries(frequent)) > 0, render(frequent)).alias(
            "frequent"
        ),
        F.size(F.map_entries("m")).cast("long").alias("n_priorities"),
    )
