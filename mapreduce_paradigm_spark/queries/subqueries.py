"""Subquery shapes: EXISTS / NOT EXISTS, IN, scalar and correlated
subqueries — the query surface where staying declarative pays most, because
Catalyst DECORRELATES these into joins/aggregates (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery) instead of executing a per-row nested loop the way
a naive engine would. Built via ``spark.sql`` over registered views so the
SQL text itself exercises the analyzer path.

The reference has no subqueries (single-input pipeline,
/root/reference/src/main.cpp); these extend its capability matrix per
SURVEY.md §2.B.
"""

from __future__ import annotations

from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import register_views


@register(
    "orders_priority_count_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_discount > 0.08
)
GROUP BY o_orderpriority
""",
    description="TPC-H Q4 shape: correlated EXISTS decorrelated by Catalyst "
    "into a left-semi join (RewritePredicateSubquery) — no per-row probing.",
    bench=True,
    tags=("subquery", "join"),
)
def q_orders_priority_count_exists(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_discount > 0.08
        )
        GROUP BY o_orderpriority
        """
    )


@register(
    "parts_never_ordered_not_exists",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_partkey = p_partkey AND l_discount > 0.09
)
""",
    description="NOT EXISTS → left-anti join under decorrelation; correlated "
    "predicate chosen to leave survivors at every SF (non-vacuous hash).",
    tags=("subquery", "join"),
)
def q_parts_never_ordered_not_exists(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE NOT EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_partkey = p_partkey AND l_discount > 0.09
        )
        """
    )


@register(
    "customers_above_avg_balance",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                          / count(*) FROM customer)
""",
    description="Uncorrelated scalar subquery (global mean) — one aggregate "
    "broadcast into the filter, engine-exact via the decimal-stable mean.",
    tags=("subquery",),
)
def q_customers_above_avg_balance(spark, sf_dir):
    register_views(spark, sf_dir)
    # identical SQL text to the oracle: the decimal cast is exact for 2dp
    # money, so both engines compute the same threshold double bit-for-bit
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                                  / count(*) FROM customer)
        """
    )


@register(
    "suppliers_above_nation_avg",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, s_acctbal
FROM supplier s
WHERE s_acctbal > (
  SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
  FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
)
""",
    description="CORRELATED scalar subquery (per-nation mean) — Catalyst "
    "rewrites to aggregate-then-join (RewriteCorrelatedScalarSubquery); the "
    "nested loop a row-engine would run never exists.",
    tags=("subquery", "join"),
)
def q_suppliers_above_nation_avg(spark, sf_dir):
    register_views(spark, sf_dir)
    # identical SQL text to the oracle (see customers_above_avg_balance)
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier s
        WHERE s_acctbal > (
          SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
          FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
        )
        """
    )


@register(
    "orders_in_top_segment_customers",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
""",
    description="IN-subquery → left-semi join.",
    tags=("subquery", "join"),
)
def q_orders_in_top_segment_customers(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        """
    )


@register(
    "top2_orders_per_customer_lateral",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
WHERE c.c_mktsegment = 'MACHINERY'
""",
    description="LATERAL correlated subquery (per-customer top-2 orders): "
    "Spark plans the correlated limit as a window group-limit over one "
    "shuffle — the declarative form of a per-key top-k probe, not a "
    "nested loop.",
    tags=("subquery", "lateral", "join"),
)
def q_top2_orders_per_customer_lateral(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        WHERE c.c_mktsegment = 'MACHINERY'
        """
    )


@register(
    "monthly_order_spine_recursive",
    oracle="""
WITH RECURSIVE spine(m, m_end) AS (
  SELECT date_trunc('month', min(o_orderdate)),
         date_trunc('month', max(o_orderdate)) FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, m_end FROM spine WHERE m < m_end
)
SELECT strftime(CAST(s.m AS DATE), '%Y-%m-%d') AS month_start,
       count(o.o_orderkey) AS n_orders
FROM spine s
LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = s.m
GROUP BY 1
""",
    description="Recursive CTE (Spark 4 WITH RECURSIVE): month spine "
    "generated by recursion, left-joined to per-month order counts — the "
    "gap-filling shape where the spine bounds come from the data itself. "
    "The upper bound is computed ONCE in the anchor and carried as a column: "
    "a scalar subquery in the recursion's WHERE is re-evaluated every "
    "iteration (one full orders scan per generated month, ~4x slower).",
    tags=("subquery", "recursive", "datetime"),
)
def q_monthly_order_spine_recursive(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE spine(m, m_end) AS (
          SELECT date_trunc('MONTH', min(o_orderdate)),
                 date_trunc('MONTH', max(o_orderdate)) FROM orders
          UNION ALL
          SELECT m + INTERVAL 1 MONTH, m_end FROM spine WHERE m < m_end
        )
        SELECT date_format(s.m, 'yyyy-MM-dd') AS month_start,
               count(o.o_orderkey) AS n_orders
        FROM spine s
        LEFT JOIN orders o ON date_trunc('MONTH', o.o_orderdate) = s.m
        GROUP BY 1
        """
    )


@register(
    "small_quantity_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_size < 15
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    description="TPC-H Q17 shape: revenue from below-one-fifth-of-average "
    "quantity lineitems for one brand's small parts. The correlated scalar "
    "AVG is decorrelated by Catalyst (RewriteCorrelatedScalarSubquery) into "
    "one per-part aggregate joined back — not a per-row rescan. Quantities "
    "are integral doubles, so the 0.2*avg threshold is bit-identical "
    "cross-engine.",
    tags=("subquery", "aggregation"),
)
def q_small_quantity_revenue(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3' AND p_size < 15
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@register(
    "suppliers_sole_late_shipper",
    oracle="""
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    description="TPC-H Q21 shape: suppliers who were the SOLE late shipper "
    "on multi-supplier finished orders (the fixture has no l_receiptdate/"
    "l_commitdate, so 'late' = shipped >60 days after the order date). "
    "EXISTS + NOT EXISTS on the same fact table; Catalyst rewrites both "
    "into semi/anti joins against per-order aggregates rather than per-row "
    "rescans of lineitem.",
    tags=("subquery", "join", "topk"),
)
def q_suppliers_sole_late_shipper(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
        """
    )


@register(
    "idle_customer_balance_by_code",
    oracle="""
SELECT code, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM (
  SELECT substr(c_name, -1) AS code, c_acctbal, c_custkey
  FROM customer
  WHERE substr(c_name, -1) IN ('1','3','5','7','9')
    AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                            / count(*)
                     FROM customer
                     WHERE c_acctbal > 0.0
                       AND substr(c_name, -1) IN ('1','3','5','7','9'))
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
)
GROUP BY code
""",
    description="TPC-H Q22 shape: above-average-balance customers with no "
    "open orders, grouped by a name-derived code (the fixture has no "
    "c_phone, so the customer-name check digit stands in for the country "
    "code; no c_custkey has zero orders at any SF, so 'idle' = no "
    "o_orderstatus='O' orders). Scalar AVG subquery + anti-join NOT EXISTS; "
    "the threshold is the decimal-stable mean, bit-identical cross-engine.",
    tags=("subquery", "aggregation"),
)
def q_idle_customer_balance_by_code(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT code, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        FROM (
          SELECT substr(c_name, -1) AS code, c_acctbal, c_custkey
          FROM customer
          WHERE substr(c_name, -1) IN ('1','3','5','7','9')
            AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                                    / count(*)
                             FROM customer
                             WHERE c_acctbal > 0.0
                               AND substr(c_name, -1) IN ('1','3','5','7','9'))
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        )
        GROUP BY code
        """
    )


@register(
    "parts_not_in_nullable_subquery",
    oracle="""
SELECT p_partkey, p_name FROM part
WHERE p_partkey NOT IN (
  SELECT nullif(l_partkey, -1) FROM lineitem WHERE l_quantity >= 48
)
""",
    description="NOT IN against a NULLABLE subquery column — the "
    "three-valued-logic join Spark plans as a NULL-AWARE anti join "
    "(a regular anti join is WRONG here: one NULL in the in-list must "
    "annihilate every row, because x NOT IN (..., NULL) is UNKNOWN, "
    "never TRUE). The nullif() wrapper forces the nullable type while "
    "leaving survivors at runtime, so the query exercises the null-aware "
    "plan without a vacuous 0-row result; the plan pin in test_plans.py "
    "asserts the single-key BroadcastHashJoin LeftAnti that Spark's NAAJ "
    "optimization emits (the build side streams once, broadcast — the "
    "naive correlated form is a nested loop). The IN-list quantity "
    "filter pushes to the parquet scan on the build side.",
    tags=("subquery", "join", "nulls"),
)
def q_parts_not_in_nullable_subquery(spark, sf_dir):
    from mapreduce_paradigm_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey NOT IN (
          SELECT nullif(l_partkey, -1) FROM lineitem WHERE l_quantity >= 48
        )
        """
    )
