"""Round-4 batch 2: warehouse-modeling & data-layout tier.

Dimensional-modeling and physical-layout operators the reference
(``src/main.cpp``, one inverted-index pipeline) has no analog for, but that
any warehouse built on this engine needs: SCD Type-2 dimension building
(gaps-and-islands run collapse → versioned validity intervals), Z-order
interleaved sort keys (multi-column data skipping), positional token
analysis (posexplode/ordinality), and the Spark 4 ``GROUP BY ALL`` SQL
surface.

All Catalyst-native, no UDFs. The Z-order bit-interleave is generated once
in Python as a PORTABLE arithmetic SQL fragment (floor/div/mod — no
dialect-specific bit operators) and shared verbatim by the Spark expression
and the DuckDB oracle, so the two engines evaluate literally the same
formula.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.files import zorder_key_expr
from mapreduce_paradigm_spark.sources.tables import load_table, register_views

# --- SCD Type-2 dimension build ----------------------------------------------


@register(
    "customer_status_scd2",
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
         lag(o_orderstatus) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev_status
  FROM orders
),
changes AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate
  FROM ordered
  WHERE prev_status IS NULL OR prev_status <> o_orderstatus
)
SELECT o_custkey AS custkey,
       CAST(row_number() OVER w AS BIGINT) AS version,
       o_orderstatus AS status,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    description="Slowly-Changing-Dimension Type-2 build from an event "
    "history: per customer, collapse consecutive orders with the same "
    "status into one run (gaps-and-islands via lag()), then emit one "
    "versioned dimension row per run with [valid_from, valid_to) "
    "validity — valid_to = next run's start via lead(), NULL marking "
    "the current row. This is how a mutable operational attribute "
    "becomes an as-of-joinable dimension (pair with operators/asof.py "
    "for point-in-time lookups). Both window passes share ONE "
    "partitioning (custkey) — at 100 TB the history shuffles once and "
    "the run-collapse typically shrinks it by orders of magnitude "
    "before the second, post-filter window evaluates on the survivors.",
    tags=("warehouse", "scd", "window", "orders"),
)
def q_customer_status_scd2(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            "o_orderdate",
            F.lag("o_orderstatus").over(w).alias("prev_status"),
        )
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
        .drop("prev_status")
    )
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


# --- Z-order interleaved sort key --------------------------------------------

_Z_BITS = 10

_ZK = zorder_key_expr("ck", "dy", _Z_BITS)


@register(
    "orders_zorder_key",
    oracle=f"""
WITH dims AS (
  SELECT o_orderkey,
         o_custkey % {1 << _Z_BITS} AS ck,
         datediff('day', DATE '1970-01-01', o_orderdate)
             % {1 << _Z_BITS} AS dy
  FROM orders
)
SELECT o_orderkey, CAST(ck AS BIGINT) AS ck, CAST(dy AS BIGINT) AS dy,
       CAST({_ZK} AS BIGINT) AS zkey
FROM dims
""",
    description="Z-order (Morton) interleaved sort key over (customer "
    "bucket, order-day bucket): bit-interleaving maps 2-D locality onto "
    "1-D sort order, so writing the fact table sorted by zkey gives "
    "parquet row-group min/max stats that prune on BOTH dimensions — "
    "the layout trick behind Delta/Iceberg Z-ORDER OPTIMIZE, built here "
    "from plain Catalyst arithmetic (the generated floor/div/mod "
    "fragment is shared verbatim with the oracle, so both engines "
    "compute literally the same key). Pair with "
    "sources.files.write_zorder_parquet, which sorts by this key "
    "inside range partitions (repartitionByRange + "
    "sortWithinPartitions — one shuffle) and whose footer-stats test "
    "proves two-dimensional row-group pruning. Per-row map work only; "
    "at 100 TB the key costs nothing beyond the write shuffle the "
    "layout needs anyway.",
    tags=("warehouse", "layout", "orders"),
)
def q_orders_zorder_key(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    dims = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % (1 << _Z_BITS)).alias("ck"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            % (1 << _Z_BITS)
        ).alias("dy"),
    )
    return dims.select(
        "o_orderkey",
        F.col("ck").cast("bigint").alias("ck"),
        F.col("dy").cast("bigint").alias("dy"),
        F.expr(_ZK).cast("bigint").alias("zkey"),
    )


# --- positional token analysis (posexplode) ----------------------------------


@register(
    "part_name_posexplode_positions",
    oracle="""
WITH t AS (
  SELECT unnest(string_split(p_name, ' ')) AS token,
         generate_subscripts(string_split(p_name, ' '), 1) AS pos
  FROM part
)
SELECT CAST(pos AS BIGINT) AS pos, token, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY 1, 2 HAVING count(*) >= 3
""",
    description="Ordinal token analysis via posexplode: explode each part "
    "name WITH its 1-based token position and count (position, token) "
    "frequencies — the positional-vocabulary profile (which words lead "
    "a name vs trail it) that schema-inference and template-detection "
    "pipelines compute over string columns. posexplode ⇔ DuckDB "
    "generate_subscripts/ordinality. Explode then one aggregate; "
    "at 100 TB the count shuffle carries (pos, token) pairs only and "
    "partial aggregation collapses them map-side.",
    tags=("warehouse", "text", "explode", "part"),
)
def q_part_name_posexplode_positions(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    toks = part.select(
        F.posexplode(F.split("p_name", " ")).alias("pos0", "token")
    )
    return (
        toks.groupBy(
            (F.col("pos0") + 1).cast("bigint").alias("pos"), "token"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") >= 3)
    )


# --- GROUP BY ALL (Spark 4 SQL surface) --------------------------------------


@register(
    "orders_group_by_all_sql",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ALL
""",
    description="GROUP BY ALL (Spark 4 / modern-SQL surface): every "
    "non-aggregate select item becomes a grouping key implicitly — the "
    "ad-hoc-analytics ergonomics both engines now share, proven "
    "semantics-identical here by hash match. Sum is the exact "
    "long-micros form. Same single hash-aggregate plan as an explicit "
    "GROUP BY; nothing extra at scale.",
    tags=("sql", "spark4", "agg", "orders"),
)
def q_orders_group_by_all_sql(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(CAST(sum(CAST(round(o_totalprice * 1e6, 0) AS BIGINT))
                 AS DECIMAL(24,6)) / 1000000 AS DOUBLE) AS revenue
FROM orders
GROUP BY ALL
"""
    )


@register(
    "lineitem_pit_customer_status",
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
         CAST(row_number() OVER w AS BIGINT) AS version,
         o_orderstatus AS status,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER w AS valid_to
  FROM ordered
  WHERE prev_status IS NULL OR prev_status <> o_orderstatus
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
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
    description="Point-in-time (as-of) join against the SCD2 dimension "
    "customer_status_scd2 builds: each shipment joins the status version "
    "whose [valid_from, valid_to) interval contains its ship date — "
    "'which era was the customer in WHEN the item shipped', the "
    "time-travel-correct lookup that a naive join to the CURRENT "
    "dimension row silently gets wrong (training-data leakage in "
    "feature pipelines, restated revenue in BI). Non-circular by "
    "construction: ship dates trail order dates, so items land in "
    "LATER status eras than the order that created them. Plan: equi-join "
    "on custkey with the interval predicate as residual — fact and "
    "dimension share the custkey partitioning (the dimension is "
    "run-collapsed, orders-of-magnitude smaller than the fact side); "
    "intervals partition each customer's timeline, so exactly one "
    "version matches per row (no post-dedup). Revenue in exact micros.",
    tags=("warehouse", "scd", "join", "asof"),
)
def q_lineitem_pit_customer_status(spark, sf_dir):
    from mapreduce_paradigm_spark.registry import all_specs

    scd2 = all_specs()["customer_status_scd2"].builder(spark, sf_dir)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    shipped = l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("custkey"),
        "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6, 0)
        .cast("long")
        .alias("rev_micro"),
    )
    pit = shipped.join(
        scd2,
        (shipped.custkey == scd2.custkey)
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
    )
    return pit.groupBy(F.col("status").alias("status_at_ship")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("rev_micro").alias("rev_micro"),
    )


# --- small-files compaction planner ------------------------------------------


@register(
    "events_compaction_plan",
    oracle="""
WITH per_day AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(32 + strlen(event_type) + strlen(props)) AS BIGINT)
           AS est_bytes
  FROM events GROUP BY 1
)
SELECT day, n_rows, est_bytes,
       CAST(CASE WHEN est_bytes = 0 THEN 1
                 ELSE (est_bytes + 262143) // 262144 END AS BIGINT)
         AS target_files,
       CAST((n_rows + (CASE WHEN est_bytes = 0 THEN 1
                            ELSE (est_bytes + 262143) // 262144 END) - 1)
            // (CASE WHEN est_bytes = 0 THEN 1
                     ELSE (est_bytes + 262143) // 262144 END) AS BIGINT)
         AS rows_per_file
FROM per_day
""",
    description="Small-files compaction planner — the lakehouse maintenance "
    "primitive: per partition (event day), estimated uncompressed bytes "
    "(fixed per-row width + variable byte lengths), the target output "
    "file count at the size goal (⌈bytes/target⌉, 256 KiB here so the "
    "fixture exercises the math — 128 MiB in production, where a file "
    "under ~one HDFS block wastes open/seek overhead and one over it "
    "defeats parallelism), and the rows-per-file write plan a "
    "repartitionByRange + maxRecordsPerFile pass executes. Pure "
    "integer arithmetic on one grouped aggregate — order-independent, "
    "full oracle. The estimate drives `coalesce`/`repartition(n)` "
    "decisions without listing files (a driver-side metadata walk that "
    "does not scale past ~10⁵ objects).",
    tags=("warehouse", "layout", "events"),
)
def q_events_compaction_plan(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    per_day = e.groupBy(
        F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            F.lit(32)
            + F.octet_length("event_type")
            + F.octet_length("props")
        )
        .cast("long")
        .alias("est_bytes"),
    )
    tf = F.when(F.col("est_bytes") == 0, F.lit(1)).otherwise(
        F.expr("(est_bytes + 262143) DIV 262144")
    )
    return per_day.select(
        "day",
        "n_rows",
        "est_bytes",
        tf.cast("long").alias("target_files"),
        F.expr(
            "CAST((n_rows + (CASE WHEN est_bytes = 0 THEN 1 "
            "ELSE (est_bytes + 262143) DIV 262144 END) - 1) "
            "DIV (CASE WHEN est_bytes = 0 THEN 1 "
            "ELSE (est_bytes + 262143) DIV 262144 END) AS BIGINT)"
        ).alias("rows_per_file"),
    )


# --- zone-map data-skipping effectiveness -------------------------------------

_ZM_BITS = 12  # 4096 covers the fixture's ~2400-day span without wraparound
_ZM_ZONES = 64
_ZM_CK_LO, _ZM_CK_HI = 100, 199
_ZM_D_LO, _ZM_D_HI = 730, 911  # days since 1995-01-01: 1997-01-01..1997-07-01

_ZM_ZK = zorder_key_expr("ck", "dy", _ZM_BITS)

# One layout per row: the physical sort order under test. Shared verbatim by
# Spark and DuckDB (ntile + min/max + the same scan predicate), so the two
# engines grade identical zone maps.
_ZM_LAYOUTS = (
    ("date_sorted", "day_nr, o_orderkey"),
    ("custkey_sorted", "o_custkey, o_orderkey"),
    ("zorder", "zkey, o_orderkey"),
)


def _zone_map_oracle() -> str:
    unions = []
    for name, order in _ZM_LAYOUTS:
        unions.append(
            f"""
SELECT '{name}' AS layout,
       CAST(count(*) AS BIGINT) AS n_zones,
       CAST(count(*) FILTER (WHERE scanned) AS BIGINT) AS zones_scanned,
       CAST(coalesce(sum(n_rows) FILTER (WHERE scanned), 0) AS BIGINT)
         AS rows_scanned,
       CAST(coalesce(sum(n_hits) FILTER (WHERE scanned), 0) AS BIGINT)
         AS rows_matched
FROM (
  SELECT zone, count(*) AS n_rows,
         count(*) FILTER (WHERE hit) AS n_hits,
         max(o_custkey) >= {_ZM_CK_LO} AND min(o_custkey) <= {_ZM_CK_HI}
         AND max(day_nr) >= {_ZM_D_LO} AND min(day_nr) <= {_ZM_D_HI}
           AS scanned
  FROM (SELECT *, ntile({_ZM_ZONES}) OVER (ORDER BY {order}) AS zone
        FROM dims)
  GROUP BY zone
)"""
        )
    body = "\nUNION ALL\n".join(unions)
    return f"""
WITH dims AS (
  SELECT o_orderkey, o_custkey,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           AS day_nr,
         o_custkey % {1 << _ZM_BITS} AS ck,
         datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           % {1 << _ZM_BITS} AS dy,
         o_custkey BETWEEN {_ZM_CK_LO} AND {_ZM_CK_HI}
         AND datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             BETWEEN {_ZM_D_LO} AND {_ZM_D_HI} AS hit
  FROM orders
),
dims2 AS (SELECT *, CAST({_ZM_ZK} AS BIGINT) AS zkey FROM dims)
{body.replace("FROM dims)", "FROM dims2)")}
ORDER BY layout
"""


@register(
    "orders_zone_map_skipping",
    oracle=_zone_map_oracle(),
    description="Zone-map (row-group min/max) data-skipping grader — the "
    "measurement half of the Z-order layout pair (orders_zorder_key / "
    "write_zorder_parquet): lay the fact table out three ways (date-"
    "sorted, custkey-sorted, Z-order Morton-interleaved), slice each "
    "layout into 64 equal zones (ntile = parquet row groups), build "
    "each zone's min/max stats on BOTH raw predicate columns, and "
    "grade one two-dimensional scan predicate (custkey range x date "
    "range) against the maps: zones scanned, rows read, rows actually "
    "matched. Single-column sorts prune only their own dimension; the "
    "Morton layout prunes on both — this query turns that claim into "
    "audited numbers, exactly how a lakehouse OPTIMIZE decision should "
    "be justified. The zone build is one window + one grouped agg per "
    "layout over a 4-column projection (scan reads nothing else); at "
    "100 TB the same grader runs on parquet footer stats via a "
    "metadata-only scan instead of ntile. Full oracle (the interleave "
    "arithmetic and predicate are shared verbatim with DuckDB).",
    tags=("warehouse", "layout", "orders"),
)
def q_orders_zone_map_skipping(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    day_nr = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    )
    dims = orders.select(
        "o_orderkey",
        "o_custkey",
        day_nr.alias("day_nr"),
        (F.col("o_custkey") % (1 << _ZM_BITS)).alias("ck"),
        (day_nr % (1 << _ZM_BITS)).alias("dy"),
        (
            F.col("o_custkey").between(_ZM_CK_LO, _ZM_CK_HI)
            & day_nr.between(_ZM_D_LO, _ZM_D_HI)
        ).alias("hit"),
    ).withColumn("zkey", F.expr(f"CAST({_ZM_ZK} AS BIGINT)"))
    out = None
    for name, order in _ZM_LAYOUTS:
        zones = (
            dims.withColumn(
                "zone",
                F.ntile(_ZM_ZONES).over(
                    Window.orderBy(*[c.strip() for c in order.split(",")])
                ),
            )
            .groupBy("zone")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_if("hit").alias("n_hits"),
                (
                    (F.max("o_custkey") >= _ZM_CK_LO)
                    & (F.min("o_custkey") <= _ZM_CK_HI)
                    & (F.max("day_nr") >= _ZM_D_LO)
                    & (F.min("day_nr") <= _ZM_D_HI)
                ).alias("scanned"),
            )
        )
        row = zones.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_zones"),
            F.count_if("scanned").cast("long").alias("zones_scanned"),
            F.coalesce(
                F.sum(F.when(F.col("scanned"), F.col("n_rows"))), F.lit(0)
            )
            .cast("long")
            .alias("rows_scanned"),
            F.coalesce(
                F.sum(F.when(F.col("scanned"), F.col("n_hits"))), F.lit(0)
            )
            .cast("long")
            .alias("rows_matched"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- golden-record survivorship ------------------------------------------------


@register(
    "customer_golden_record",
    oracle="""
WITH ranked AS (
  SELECT o_custkey,
         o_orderstatus, o_orderpriority, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC)
           AS rn_recent,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC)
           AS rn_value,
         count(*) OVER (PARTITION BY o_custkey, o_orderpriority) AS pcnt
  FROM orders
),
freq AS (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY pcnt DESC, o_orderpriority ASC,
                                        o_orderdate DESC)
              AS rn_freq
  FROM ranked
)
SELECT o_custkey AS custkey,
       CAST(count(*) AS BIGINT) AS n_records,
       max(CASE WHEN rn_recent = 1 THEN o_orderstatus END) AS status_recent,
       max(CASE WHEN rn_value = 1 THEN o_orderpriority END)
         AS priority_best_value,
       max(CASE WHEN rn_freq = 1 THEN o_orderpriority END)
         AS priority_most_frequent,
       min(o_orderdate) AS first_seen,
       max(o_orderdate) AS last_seen,
       CAST(sum(CAST(round(o_totalprice * 1000000, 0) AS BIGINT))
            AS BIGINT) AS lifetime_micro
FROM freq
GROUP BY 1
""",
    description="Entity-resolution golden-record build with per-attribute "
    "survivorship rules — the merge step every MDM / customer-360 "
    "pipeline runs after matching: for each entity (customer), fuse its "
    "records (orders) into ONE row where each attribute survives by its "
    "own rule: status by RECENCY (latest record wins), priority by BEST "
    "VALUE (the record with the highest monetary total donates it) and "
    "separately by FREQUENCY (modal value, ties broken lexically then "
    "by recency), plus first/last-seen bounds and an integer-micros "
    "lifetime total. All three argmax rules are row_number survivor "
    "flags folded by conditional aggregation, so the whole fuse is ONE "
    "hash shuffle on the entity key: the recency/value windows sort "
    "within the same custkey partitioning, the frequency count's "
    "(custkey, priority) clustering is satisfied by hash(custkey) — no "
    "second exchange — and the final groupBy reuses it again. At 100 TB "
    "the entity key is the match-cluster id from dedup_clusters and the "
    "same plan applies unchanged. Full oracle.",
    tags=("warehouse", "window", "orders"),
)
def q_customer_golden_record(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w_recent = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    w_value = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    ranked = orders.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w_recent).alias("rn_recent"),
        F.row_number().over(w_value).alias("rn_value"),
    ).withColumn(
        "pcnt",
        F.count(F.lit(1)).over(
            Window.partitionBy("o_custkey", "o_orderpriority")
        ),
    )
    freq = ranked.withColumn(
        "rn_freq",
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy(
                F.col("pcnt").desc(),
                F.col("o_orderpriority").asc(),
                F.col("o_orderdate").desc(),
            )
        ),
    )
    return freq.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.max(
            F.when(F.col("rn_recent") == 1, F.col("o_orderstatus"))
        ).alias("status_recent"),
        F.max(
            F.when(F.col("rn_value") == 1, F.col("o_orderpriority"))
        ).alias("priority_best_value"),
        F.max(
            F.when(F.col("rn_freq") == 1, F.col("o_orderpriority"))
        ).alias("priority_most_frequent"),
        F.min("o_orderdate").alias("first_seen"),
        F.max("o_orderdate").alias("last_seen"),
        F.sum(
            F.round(F.col("o_totalprice") * 1000000, 0).cast("long")
        )
        .cast("long")
        .alias("lifetime_micro"),
    )


# --- incremental rollup maintenance -------------------------------------------

_IRM_SPLIT = "DATE '1999-01-01'"


@register(
    "orders_incremental_rollup_merge",
    oracle="""
SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 1000000, 0) AS BIGINT)) AS BIGINT)
         AS revenue_micro,
       CAST(min(CAST(round(o_totalprice * 1000000, 0) AS BIGINT)) AS BIGINT)
         AS min_price_micro,
       CAST(max(CAST(round(o_totalprice * 1000000, 0) AS BIGINT)) AS BIGINT)
         AS max_price_micro,
       CAST(sum(CAST(round(o_totalprice * 1000000, 0) AS BIGINT))
            // count(*) AS BIGINT) AS avg_price_micro
FROM orders
GROUP BY 1
""",
    description="Incremental materialized-view maintenance — merge of "
    "partial aggregation STATE: the monthly revenue rollup is kept as "
    "mergeable partials (count, sum, min, max — never avg), the "
    "late-arriving delta batch (orders on/after the split date) is "
    "aggregated alone, and the refreshed view is a full-outer "
    "key-merge of the two partial tables combining each component by "
    "its own monoid (+, +, least, greatest) with avg DERIVED from "
    "merged sum/count at read time. The ORACLE aggregates the whole "
    "table from scratch, so any error in the merge algebra (the "
    "classic avg-of-avgs bug, a dropped delta-only or base-only key) "
    "hash-mismatches. At 100 TB this is the nightly-refresh pattern: "
    "the base rescan disappears (only its stored partials are read) "
    "and cost is delta-sized; the same algebra is what partial "
    "ObjectHashAggregate does inside one query, lifted across query "
    "BOUNDARIES. Both sides group on the same key, and the merge join "
    "keys equal the grouping keys — one shuffle each side, "
    "output-sized. Full oracle.",
    tags=("warehouse", "orders", "incremental"),
)
def q_orders_incremental_rollup_merge(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    micro = F.round(F.col("o_totalprice") * 1000000, 0).cast("long")
    month = F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM")

    def partials(df):
        return df.groupBy(month.alias("month")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(micro).cast("long").alias("s"),
            F.min(micro).cast("long").alias("mn"),
            F.max(micro).cast("long").alias("mx"),
        )

    split = F.expr(_IRM_SPLIT)
    base = partials(orders.filter(F.col("o_orderdate").cast("date") < split))
    delta = partials(orders.filter(F.col("o_orderdate").cast("date") >= split))
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, "month", "full_outer").select(
        "month",
        (F.coalesce(F.col("b.cnt"), F.lit(0)) + F.coalesce(F.col("d.cnt"), F.lit(0))).alias("n_orders"),
        (F.coalesce(F.col("b.s"), F.lit(0)) + F.coalesce(F.col("d.s"), F.lit(0))).alias("revenue_micro"),
        F.least(
            F.coalesce(F.col("b.mn"), F.col("d.mn")),
            F.coalesce(F.col("d.mn"), F.col("b.mn")),
        ).alias("min_price_micro"),
        F.greatest(
            F.coalesce(F.col("b.mx"), F.col("d.mx")),
            F.coalesce(F.col("d.mx"), F.col("b.mx")),
        ).alias("max_price_micro"),
    )
    return merged.withColumn(
        "avg_price_micro",
        F.expr("CAST(revenue_micro DIV n_orders AS BIGINT)"),
    )


# --- join-MV delta maintenance (both-side deltas) ----------------------------


@register(
    "order_customer_join_mv_delta",
    oracle="""
SELECT c.c_mktsegment, date_trunc('month', o.o_orderdate) AS order_month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 1000000, 0) AS BIGINT)) AS BIGINT)
         AS revenue_micro
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
""",
    description="Incremental maintenance of a JOIN-aggregate materialized "
    "view under deltas on BOTH sides — the trilinear IVM rule "
    "(O+dO)x(C+dC) = OxC + dOxC + OxdC + dOxdC, which the fact-only "
    "rollup-merge query cannot express: the stored MV is the aggregated "
    "old-orders x old-customers term, the three delta join terms are "
    "aggregated together in one pass, and the refresh is a full-outer "
    "key merge adding count/sum monoids. The oracle recomputes the view "
    "from scratch, so any error in the delta algebra (a missed term, a "
    "double-counted dOxdC, a dropped one-sided key) hash-mismatches. "
    "Scale shape: each delta term is delta-sized on at least one side — "
    "dO terms broadcast the day's customers, OxdC re-joins the fact "
    "only against the (tiny) changed-customer set — so the nightly "
    "refresh cost tracks the delta, never the 100 TB base; the merge "
    "itself is MV-sized. Revenue is integer micros end-to-end (exact, "
    "association-free).",
    tags=("warehouse", "join", "aggregation", "datetime"),
)
def q_order_customer_join_mv_delta(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    is_new_cust = F.col("c_custkey") % 10 == 0
    c_old, c_new = cust.where(~is_new_cust), cust.where(is_new_cust)
    is_new_ord = F.col("o_orderdate").cast("date") >= F.lit("1998-01-01")
    o_old, o_new = orders.where(~is_new_ord), orders.where(is_new_ord)

    def joined(o, c):
        return o.join(c, o["o_custkey"] == c["c_custkey"]).select(
            "c_mktsegment",
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
            F.round(F.col("o_totalprice") * 1e6, 0).cast("long").alias("micro"),
        )

    def agg(df):
        return df.groupBy("c_mktsegment", "order_month").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("micro").alias("rev"),
        )

    # stored MV: the old x old term, kept aggregated
    mv = agg(joined(o_old, F.broadcast(c_old)))
    # one pass over the three delta terms (each delta-sized on >= one side)
    delta = agg(
        joined(o_new, F.broadcast(c_old))
        .unionByName(joined(o_old, F.broadcast(c_new)))
        .unionByName(joined(o_new, F.broadcast(c_new)))
    )
    b, d = mv.alias("b"), delta.alias("d")
    return b.join(d, ["c_mktsegment", "order_month"], "full_outer").select(
        "c_mktsegment",
        "order_month",
        (
            F.coalesce(F.col("b.cnt"), F.lit(0)) + F.coalesce(F.col("d.cnt"), F.lit(0))
        ).alias("n_orders"),
        (
            F.coalesce(F.col("b.rev"), F.lit(0)) + F.coalesce(F.col("d.rev"), F.lit(0))
        ).alias("revenue_micro"),
    )


# --- merkle-style bucket-hash snapshot reconciliation ------------------------

_RECON_BUCKETS = 128


@register(
    "orders_bucket_hash_reconcile",
    oracle=f"""
WITH a AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
         o_orderstatus AS st
  FROM orders
),
b AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT)
           + CASE WHEN o_orderkey % 197 = 0 THEN 1 ELSE 0 END AS cents,
         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
         o_orderstatus AS st
  FROM orders WHERE o_orderkey % 211 <> 0
),
fa AS (
  SELECT ('0x' || substr(md5('b:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           % {_RECON_BUCKETS} AS bucket,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
                             CAST(cents AS VARCHAR) || '|' || day || '|' || st),
                         1, 15))::BIGINT AS fp
  FROM a
),
fb AS (
  SELECT ('0x' || substr(md5('b:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           % {_RECON_BUCKETS} AS bucket,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||
                             CAST(cents AS VARCHAR) || '|' || day || '|' || st),
                         1, 15))::BIGINT AS fp
  FROM b
),
ga AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_a, bit_xor(fp) AS x_a
       FROM fa GROUP BY 1),
gb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_b, bit_xor(fp) AS x_b
       FROM fb GROUP BY 1)
SELECT ga.bucket, ga.n_a, gb.n_b,
       ga.n_a = gb.n_b AS rows_match,
       ga.n_a = gb.n_b AND ga.x_a = gb.x_b AS content_match
FROM ga JOIN gb USING (bucket)
""",
    description="Merkle-style snapshot reconciliation: two table snapshots "
    f"(B derives from A with deterministic drift — dropped rows, "
    f"perturbed prices) are compared through {_RECON_BUCKETS} "
    "hash-partitioned bucket digests (row count + bit_xor of a 60-bit "
    "md5 row fingerprint) instead of a row-level join — the anti-entropy "
    "pattern replica repair uses: exchange sketch-sized digest tables, "
    "then re-sync ONLY the buckets whose digests diverge. Per side the "
    "corpus-scale work is one scan + one map-combined bucket aggregate; "
    "the digest comparison joins 128-row frames. XOR makes the digest "
    "order- and partitioning-independent (and identical row PAIRS "
    "cancel — production pairs it with the count and an addition-mod-2^k "
    "fold, as here the count column catches the cancellation case). "
    "Fingerprints stringify via integer cents and NTZ date casts, so "
    "both engines hash literally the same bytes; full oracle.",
    tags=("warehouse", "sketch", "datetime"),
)
def q_orders_bucket_hash_reconcile(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.col("o_orderdate").cast("date").cast("string").alias("day"),
        F.col("o_orderstatus").alias("st"),
    )
    snap_b = base.where(F.col("o_orderkey") % 211 != 0).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % 197 == 0, F.lit(1)).otherwise(F.lit(0)),
    )

    def digest(df, n_col, x_col):
        k = F.col("o_orderkey").cast("string")
        fp_src = F.concat_ws(
            "|", k, F.col("cents").cast("string"), F.col("day"), F.col("st")
        )
        return (
            df.select(
                (
                    F.conv(F.substring(F.md5(F.concat(F.lit("b:"), k)), 1, 8), 16, 10)
                    .cast("long")
                    % _RECON_BUCKETS
                ).alias("bucket"),
                F.conv(F.substring(F.md5(fp_src), 1, 15), 16, 10)
                .cast("long")
                .alias("fp"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias(n_col),
                F.expr("bit_xor(fp)").alias(x_col),
            )
        )

    ga = digest(base, "n_a", "x_a")
    gb = digest(snap_b, "n_b", "x_b")
    return ga.join(gb, "bucket").select(
        "bucket",
        "n_a",
        "n_b",
        (F.col("n_a") == F.col("n_b")).alias("rows_match"),
        (
            (F.col("n_a") == F.col("n_b")) & (F.col("x_a") == F.col("x_b"))
        ).alias("content_match"),
    )


# --- bitemporal belief audit ----------------------------------------------------


@register(
    "orders_bitemporal_belief",
    oracle="""
WITH v AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS p0,
         (o_orderkey % 5 = 0) AS corrected
  FROM orders
),
-- version rows: (valid_from_d, valid_to_d, tx_from_d, tx_to_d) as day
-- offsets from the order date; uncorrected orders carry one open row,
-- corrected ones the classic three-row bitemporal history
ver AS (
  SELECT o_orderkey, o_orderpriority, corrected, p0 AS price_c,
         0 AS vf, 999999 AS vt, 0 AS tf,
         CASE WHEN corrected THEN 10 ELSE 999999 END AS tt
  FROM v
  UNION ALL
  SELECT o_orderkey, o_orderpriority, corrected, p0,
         0, 3, 10, 999999 FROM v WHERE corrected
  UNION ALL
  SELECT o_orderkey, o_orderpriority, corrected, (p0 * 9) // 10,
         3, 999999, 10, 999999 FROM v WHERE corrected
)
SELECT o_orderpriority,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_orderkey) FILTER (WHERE corrected) AS BIGINT)
         AS n_corrected,
       CAST(sum(price_c) FILTER (WHERE vf <= 1 AND 1 < vt
                                   AND tf <= 5 AND 5 < tt) AS BIGINT)
         AS believed_v1_tx5,
       CAST(sum(price_c) FILTER (WHERE vf <= 5 AND 5 < vt
                                   AND tf <= 5 AND 5 < tt) AS BIGINT)
         AS believed_v5_tx5,
       CAST(sum(price_c) FILTER (WHERE vf <= 1 AND 1 < vt
                                   AND tf <= 15 AND 15 < tt) AS BIGINT)
         AS believed_v1_tx15,
       CAST(sum(price_c) FILTER (WHERE vf <= 5 AND 5 < vt
                                   AND tf <= 15 AND 15 < tt) AS BIGINT)
         AS believed_v5_tx15
FROM ver GROUP BY 1
""",
    description="Bitemporal belief audit: a deterministic two-axis "
    "version table over orders (every 5th order gets a retroactive "
    "price correction RECORDED at day +10 that APPLIES from valid day "
    "+3 — the classic 3-row bitemporal history: the original belief's "
    "transaction interval closes, the unchanged early validity and the "
    "corrected late validity reopen), then the 'what did we believe at "
    "transaction time T about the state valid at time V' sum for the "
    "2x2 (V in {+1,+5}) x (T in {+5,+15}) grid. Only the "
    "(late-valid, late-tx) cell sees the correction — exactly the "
    "audit/restatement semantics SCD2 (one time axis) cannot express, "
    "and what a 100 TB ledger needs to answer 'was this report correct "
    "WHEN IT RAN'. Version intervals are day offsets (row-local, exact "
    "integers), selection is pure interval containment — one conditional "
    "aggregate pass, no joins, no windows. Full oracle.",
    tags=("warehouse", "scd", "bitemporal"),
)
def q_orders_bitemporal_belief(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("p0"),
        (F.col("o_orderkey") % 5 == 0).alias("corrected"),
    )
    inf = F.lit(999999)
    base = F.struct(
        F.col("p0").alias("price_c"),
        F.lit(0).alias("vf"),
        inf.alias("vt"),
        F.lit(0).alias("tf"),
        F.when(F.col("corrected"), F.lit(10)).otherwise(inf).alias("tt"),
    )
    early = F.struct(
        F.col("p0").alias("price_c"),
        F.lit(0).alias("vf"),
        F.lit(3).alias("vt"),
        F.lit(10).alias("tf"),
        inf.alias("tt"),
    )
    late = F.struct(
        F.expr("(p0 * 9) DIV 10").alias("price_c"),
        F.lit(3).alias("vf"),
        inf.alias("vt"),
        F.lit(10).alias("tf"),
        inf.alias("tt"),
    )
    ver = o.select(
        "o_orderkey",
        "o_orderpriority",
        "corrected",
        F.explode(
            F.when(F.col("corrected"), F.array(base, early, late)).otherwise(
                F.array(base)
            )
        ).alias("r"),
    ).select("o_orderkey", "o_orderpriority", "corrected", "r.*")

    def believed(tv, tt):
        cond = (
            (F.col("vf") <= tv)
            & (F.lit(tv) < F.col("vt"))
            & (F.col("tf") <= tt)
            & (F.lit(tt) < F.col("tt"))
        )
        return F.sum(F.when(cond, F.col("price_c")))

    return ver.groupBy("o_orderpriority").agg(
        F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
        F.countDistinct(
            F.when(F.col("corrected"), F.col("o_orderkey"))
        )
        .cast("long")
        .alias("n_corrected"),
        believed(1, 5).alias("believed_v1_tx5"),
        believed(5, 5).alias("believed_v5_tx5"),
        believed(1, 15).alias("believed_v1_tx15"),
        believed(5, 15).alias("believed_v5_tx15"),
    )
