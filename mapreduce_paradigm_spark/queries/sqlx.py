"""Round-3 batch 2: SQL-surface extensions + sequence packing.

Widens the engine's declarative surface with capabilities the reference
(409-line single-pipeline C++, src/main.cpp) has no analog for, but that a
user of a general analytics engine expects day-one, plus one more
LLM-pipeline operator (sample packing). Everything here is pure
Catalyst-expressible — no UDFs, no collect — so pushdown/pruning/codegen
survive and the 100 TB plan is the same shape as the sf0.01 plan:

- ``doc_pack_bins``       — greedy contiguous sequence packing (LLM batch prep)
- ``nation_segment_listagg`` — listagg / string_agg WITHIN GROUP (Spark 4)
- ``lineitem_median_mode``   — median / mode builtin aggregates
- ``lineitem_try_arithmetic``— try_add / try_divide / try_cast null-safe tier
- ``price_histogram``        — width_bucket equi-width binning
- ``revenue_sql_udf``        — SQL-defined scalar UDF (Catalyst-inlined)
- ``url_parse_suite``        — parse_url host/path/param extraction
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import load_table, register_views

# --- sequence packing --------------------------------------------------------


@register(
    "doc_pack_bins",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST(floor(cum_before / 512) AS BIGINT) AS bin_id
FROM cum
""",
    description="Greedy contiguous sequence packing: assign docs (in stable "
    "doc_id order per source shard) to fixed 512-token training bins by "
    "running token total — the sample-packing step that turns a deduped "
    "corpus into dense fixed-length LLM batches. bin = floor(cum_before/"
    "budget), so a doc straddling a boundary opens the next bin (greedy "
    "first-fit-in-order, deterministic across engines/cluster sizes). One "
    "window shuffle partitioned by source; at 100 TB each source shard "
    "packs independently — no global order, no driver state.",
    bench=True,
    tags=("llm", "packing", "window"),
)
def q_doc_pack_bins(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return cum.select(
        "doc_id", "source", "n_tokens", F.expr("cum_before DIV 512").alias("bin_id")
    )


# --- listagg (Spark 4) -------------------------------------------------------


@register(
    "nation_segment_listagg",
    oracle="""
SELECT n_name,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
       CAST(count(*) AS BIGINT) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    description="Ordered grouped string concatenation: Spark 4 "
    "listagg(...) WITHIN GROUP (ORDER BY ...) == DuckDB string_agg(... "
    "ORDER BY ...). Deterministic output (sort inside the aggregate), "
    "unlike bare collect_list; the per-group sort runs distributed in the "
    "aggregate buffer, never on the driver.",
    tags=("sql", "agg", "spark4"),
)
def q_nation_segment_listagg(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT n_name,
       listagg(c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment) AS segs,
       count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""
    )


# --- median / mode -----------------------------------------------------------


@register(
    "lineitem_median_mode",
    oracle="""
SELECT l_returnflag,
       round(median(l_quantity), 4) AS med_qty,
       round(median(l_extendedprice), 4) AS med_price,
       CAST(mode(l_linenumber) AS BIGINT) AS mode_line,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    description="median()/mode() builtin aggregates (Spark 3.4+) per "
    "return flag. mode(l_linenumber) is tie-free by construction (line 1 "
    "exists for every order, higher lines only sometimes). median is the "
    "exact interpolated percentile — the sketch path at 100 TB is "
    "quantity_approx_percentiles.",
    tags=("agg", "percentile"),
)
def q_lineitem_median_mode(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
        F.mode("l_linenumber").cast("long").alias("mode_line"),
        F.count(F.lit(1)).alias("n"),
    )


# --- try_* null-safe arithmetic ----------------------------------------------


@register(
    "lineitem_try_arithmetic",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity = 17 THEN NULL
            ELSE l_extendedprice / (l_quantity - 17.0) END AS safe_div,
       CASE WHEN l_linenumber % 2 = 0 THEN CAST(l_quantity AS DOUBLE)
            ELSE TRY_CAST(l_returnflag AS DOUBLE) END AS parsed,
       CASE WHEN l_orderkey > 7 THEN NULL
            ELSE 9223372036854775800 + l_orderkey END AS big_add
FROM lineitem
""",
    description="Null-safe arithmetic tier for dirty-data pipelines: "
    "try_divide (÷0 → NULL, not an ANSI raise), try_cast (unparseable → "
    "NULL), try_add (int64 overflow → NULL). The quarantine-style "
    "complement to the engine's default loud-ANSI semantics — at 100 TB "
    "you route rows through try_* and filter the NULLs into a reject "
    "sink instead of failing the job; per-row codegen, no shuffle.",
    tags=("sql", "cleaning"),
)
def q_lineitem_try_arithmetic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    mixed = F.when(
        F.col("l_linenumber") % 2 == 0, F.col("l_quantity").cast("string")
    ).otherwise(F.col("l_returnflag"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw IEEE quotient, deliberately unrounded: one division of identical
        # doubles is bit-identical cross-engine, while round(q, 4) is not —
        # price/(qty-17) lands on exact 4dp ties where HALF_UP differs
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - F.lit(17.0)).alias(
            "safe_div"
        ),
        mixed.try_cast("double").alias("parsed"),
        F.try_add(F.lit(9223372036854775800), F.col("l_orderkey")).alias("big_add"),
    )


# --- width_bucket histogram --------------------------------------------------


@register(
    "price_histogram",
    oracle="""
WITH b AS (
  SELECT CASE WHEN l_extendedprice < 900.0 THEN 0
              WHEN l_extendedprice >= 105000.0 THEN 21
              ELSE CAST(floor((l_extendedprice - 900.0)
                              / ((105000.0 - 900.0) / 20)) AS BIGINT) + 1 END AS bucket
  FROM lineitem
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bucket
""",
    description="Equi-width histogram via width_bucket(price, 900, 105000, "
    "20) — 20 in-range buckets plus underflow 0 / overflow 21, the "
    "one-pass distribution profile used for skew detection before choosing "
    "a partitioning. Oracle mirrors Spark's exact bucket formula "
    "(floor((x-lo)/((hi-lo)/n))+1) so boundary doubles bin identically.",
    tags=("agg", "profiling"),
)
def q_price_histogram(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.width_bucket("l_extendedprice", F.lit(900.0), F.lit(105000.0), F.lit(20))
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- SQL-defined scalar UDF --------------------------------------------------


@register(
    "revenue_sql_udf",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(18,6))) AS DOUBLE) AS net_revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag
""",
    description="SQL-language scalar UDF (CREATE TEMPORARY FUNCTION ... "
    "RETURN expr, Spark 3.5+/4): net_price() is inlined by Catalyst into "
    "the aggregate expression — zero call overhead, full codegen, "
    "pushdown intact — unlike any Python UDF. The right way to share "
    "business logic across queries at 100 TB. Sum uses the engine's "
    "exact long-micros accumulation (functions.dsum semantics) inside "
    "SQL.",
    tags=("sql", "udf", "spark4"),
)
def q_revenue_sql_udf(spark, sf_dir):
    register_views(spark, sf_dir)
    spark.sql(
        """
CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE, t DOUBLE)
RETURNS DOUBLE
RETURN p * (CAST(1.0 AS DOUBLE) - d) * (CAST(1.0 AS DOUBLE) + t)
"""
    )
    return spark.sql(
        """
SELECT l_returnflag,
       CAST(CAST(sum(CAST(round(net_price(l_extendedprice, l_discount, l_tax) * 1e6, 0)
                          AS BIGINT)) AS DECIMAL(24,6)) / 1000000 AS DOUBLE) AS net_revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag
"""
    )


# --- parse_url ---------------------------------------------------------------


@register(
    "url_parse_suite",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://sub' || CAST(doc_id % 5 AS VARCHAR) || '.example.org/p/'
           || CAST(doc_id % 97 AS VARCHAR) || '?q=' || CAST(doc_id % 13 AS VARCHAR)
           || '&u=' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, 'https?://([^/]+)', 1) AS host,
       regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param
FROM u
""",
    description="URL decomposition with parse_url (host / path / single "
    "query param) — the domain-extraction step of web-corpus curation "
    "(per-domain quality rates, domain blocklists). The corpus is "
    "synthetic word salad, so deterministic doc_id-derived URLs are "
    "injected in-query (same pattern as pii_redaction); the oracle "
    "re-derives the same fields with portable regexes. Per-row codegen, "
    "no shuffle.",
    tags=("textstats", "llm", "web"),
)
def q_url_parse_suite(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://sub"),
        F.pmod("doc_id", F.lit(5)).cast("string"),
        F.lit(".example.org/p/"),
        F.pmod("doc_id", F.lit(97)).cast("string"),
        F.lit("?q="),
        F.pmod("doc_id", F.lit(13)).cast("string"),
        F.lit("&u="),
        F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
    )


# --- timezone conversion suite -----------------------------------------------


@register(
    "events_timezone_suite",
    oracle="""
SELECT event_id,
       strftime(timezone('America/New_York', timezone('UTC', ts)),
                '%Y-%m-%d %H:%M:%S') AS ny_local,
       strftime(timezone('Asia/Tokyo', timezone('UTC', ts)),
                '%Y-%m-%d %H:%M:%S') AS tokyo_local,
       CAST(year(timezone('Asia/Tokyo', timezone('UTC', ts)))
            - year(ts) AS BIGINT) AS year_shift
FROM events
""",
    description="Timezone conversion suite: event timestamps (stored "
    "timezone-naive, semantically UTC) rendered as New York and Tokyo "
    "wall-clock strings, plus the year-boundary shift the Tokyo offset "
    "causes around New Year — the localization step every multi-region "
    "report needs. Spark `from_utc_timestamp` == DuckDB "
    "`timezone(zone, timezone('UTC', ts))` (the inner call pins the "
    "naive→instant interpretation to UTC, so neither engine's SESSION "
    "timezone can change the result — the oracle would otherwise follow "
    "the host tz). Both engines share the IANA tzdb; the fixture is "
    "January-only so no DST transitions are in play. Per-row codegen, "
    "no shuffle.",
    tags=("sql", "datetime", "events"),
)
def q_events_timezone_suite(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tokyo = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return ev.select(
        "event_id",
        F.date_format(ny, "yyyy-MM-dd HH:mm:ss").alias("ny_local"),
        F.date_format(tokyo, "yyyy-MM-dd HH:mm:ss").alias("tokyo_local"),
        (F.year(tokyo) - F.year("ts")).cast("long").alias("year_shift"),
    )


# --- null-safe equality join -------------------------------------------------


@register(
    "nullsafe_bucket_join",
    oracle="""
WITH a AS (
  SELECT CASE WHEN l_linenumber % 3 = 0 THEN NULL
              ELSE l_linenumber % 3 END AS bucket,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
),
b AS (
  SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE o_orderkey % 3 END AS bucket,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT a.bucket, n_lines, n_orders
FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
""",
    description="Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): "
    "NULL keys MATCH each other instead of silently dropping — the "
    "semantics a dirty-data join needs when NULL means 'unknown bucket' "
    "rather than 'no bucket'. A plain equi-join here would lose the NULL "
    "row on both sides; the driver hash gate proves both engines agree "
    "on the null-match row. Planned as a normal hash join (null-safe "
    "equality is still an equi-join key, not a theta residual).",
    tags=("sql", "join", "nulls"),
)
def q_nullsafe_bucket_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    a = li.groupBy(
        F.when(F.col("l_linenumber") % 3 == 0, None)
        .otherwise(F.col("l_linenumber") % 3)
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_lines"))
    b = orders.groupBy(
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_orderkey") % 3)
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return a.join(
        b, a["bucket"].eqNullSafe(b["bucket"])
    ).select(a["bucket"], "n_lines", "n_orders")


# --- nested struct operations ------------------------------------------------


@register(
    "orders_struct_ops",
    oracle="""
SELECT o_orderkey,
       o_totalprice AS price,
       round(o_totalprice * 1.1, 2) AS adjusted_price,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderpriority AS priority
FROM orders
WHERE o_orderkey % 100 = 0
""",
    description="Nested STRUCT column surgery: pack order fields into a "
    "struct, evolve it with withField (add adjusted_price, overwrite a "
    "member) and dropFields (remove the status member), then project "
    "nested members back out. The optimizer prunes untouched struct "
    "members all the way to the scan, so nesting costs nothing it "
    "doesn't use — the pattern for schema'd event payloads at 100 TB. "
    "The oracle is the flat equivalent: hash parity proves the struct "
    "round-trip is lossless.",
    tags=("sql", "struct", "orders"),
)
def q_orders_struct_ops(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    packed = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").alias("odate"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        ).alias("o"),
    )
    evolved = packed.withColumn(
        "o",
        F.col("o")
        .withField("adjusted_price", F.round(F.col("o.price") * 1.1, 2))
        .withField("order_year", F.year(F.col("o.odate")).cast("long"))
        .dropFields("status", "odate"),
    )
    return evolved.select(
        "o_orderkey",
        F.col("o.price").alias("price"),
        F.col("o.adjusted_price").alias("adjusted_price"),
        F.col("o.order_year").alias("order_year"),
        F.col("o.priority").alias("priority"),
    )


@register(
    "part_binary_bit_funcs",
    oracle="""
SELECT p_partkey,
       base64(encode(p_name)) AS name_b64,
       hex(encode(p_name)) AS name_hex,
       sha256(p_name) AS name_sha256,
       CAST(bit_count(CAST(p_partkey AS BIGINT)) AS INTEGER) AS key_bits,
       xor(CAST(p_partkey AS BIGINT), 255) AS key_xor,
       CAST(p_partkey AS BIGINT) << 3 AS key_shl,
       CAST(p_partkey AS BIGINT) >> 1 AS key_shr
FROM part
""",
    description="Binary / bit-manipulation function suite (the remaining "
    "engine-portable scalar family): base64 and hex encodings of UTF-8 "
    "bytes, SHA-256 content digests (lowercase hex both engines — the "
    "content-addressing primitive behind dedup_exact's md5 tier), "
    "bit_count (popcount — the SimHash Hamming primitive exposed as SQL), "
    "xor and arithmetic shifts on 64-bit keys (hash mixing / bucket "
    "arithmetic). Pure per-row codegen, no shuffle; cross-engine parity "
    "notes: Spark hex() and DuckDB hex(encode()) are both uppercase, "
    "Spark sha2(x, 256) == DuckDB sha256(x), Spark bit_count returns INT "
    "(DuckDB BIGINT — cast), and Spark's ^ is DuckDB's xor() (DuckDB ^ "
    "is exponentiation).",
    tags=("functions", "sql"),
)
def q_part_binary_bit_funcs(spark, sf_dir):
    key = F.col("p_partkey").cast("long")
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("name_b64"),
        F.hex(F.col("p_name").cast("binary")).alias("name_hex"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        F.bit_count(key).alias("key_bits"),
        key.bitwiseXOR(F.lit(255)).alias("key_xor"),
        F.shiftleft(key, 3).alias("key_shl"),
        F.shiftright(key, 1).alias("key_shr"),
    )


@register(
    "part_generator_outer_suite",
    oracle="""
WITH base AS (
  SELECT p_partkey,
         CASE WHEN p_size >= 30 THEN CAST([] AS VARCHAR[])
              ELSE string_split(p_name, ' ') END AS toks
  FROM part
),
ex AS (
  SELECT b.p_partkey, u.tok, u.pos
  FROM base b
  LEFT JOIN LATERAL (
    SELECT unnest(toks) AS tok,
           CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos
  ) u ON TRUE
)
SELECT p_partkey, pos, tok FROM ex
""",
    description="Outer generator semantics: posexplode_outer keeps a row "
    "(NULL pos/token) for parts whose token array is EMPTY (p_size >= 30 "
    "here) — plain explode silently DROPS those parent rows, the classic "
    "fan-out bug where entities with no children vanish from downstream "
    "counts. The oracle spells the same semantics as LEFT JOIN LATERAL "
    "unnest. Generators run row-local (no shuffle); the _outer variants "
    "cost nothing extra — there is no reason to accept child-less row "
    "loss by default in a pipeline whose joins later assume every "
    "entity is present.",
    tags=("functions", "sql", "explode"),
)
def q_part_generator_outer_suite(spark, sf_dir):
    base = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(
            F.col("p_size") >= 30, F.expr("CAST(array() AS ARRAY<STRING>)")
        )
        .otherwise(F.split(F.col("p_name"), " "))
        .alias("toks"),
    )
    return base.select(
        "p_partkey", F.posexplode_outer("toks").alias("pos", "tok")
    )


@register(
    "orders_pivot_multi_agg",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_total,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_total,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
            FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_total
FROM orders GROUP BY o_orderpriority
""",
    description="Pivot with MULTIPLE aggregates per cell (count + exact "
    "revenue for each order status): Spark's pivot() with an explicit "
    "value list and two aggregate expressions — the explicit list keeps "
    "the plan a single conditional-aggregate pass (omitting it adds a "
    "distinct-values collection job AND makes the output schema "
    "data-dependent, which breaks downstream contracts when a status "
    "vanishes from a partition). Columns renamed to the oracle's "
    "FILTER-clause names; dsum micros discipline for the sums. One "
    "shuffle regardless of statuses x aggregates.",
    tags=("pivot", "aggregation", "orders"),
)
def q_orders_pivot_multi_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("o_totalprice") * 1e6, 0).cast("long"))
                .cast("decimal(24,6)")
                / F.lit(1000000)
            )
            .cast("double")
            .alias("total"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.col("F_n").alias("f_n"),
        F.col("F_total").alias("f_total"),
        F.col("O_n").alias("o_n"),
        F.col("O_total").alias("o_total"),
        F.col("P_n").alias("p_n"),
        F.col("P_total").alias("p_total"),
    )


@register(
    "orders_union_schema_drift",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority, NULL AS legacy_status
FROM orders WHERE year(o_orderdate) >= 1998
UNION ALL
SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority,
       o_orderstatus AS legacy_status
FROM orders WHERE year(o_orderdate) < 1998
""",
    description="Schema-drift union: two extracts of the same feed whose "
    "schemas diverged (the new one carries o_orderpriority, the legacy "
    "one a legacy_status column) combined with unionByName(allowMissing"
    "Columns=True) — missing columns NULL-fill by NAME, where plain "
    "union() matches by POSITION and silently pairs unrelated columns "
    "(the classic column-swap corruption when feeds evolve). This is "
    "the batch twin of the parquet mergeSchema reader "
    "(sources/files.py read_parquet_merged); the oracle spells the "
    "NULL-fill explicitly. Zero-cost operation: a union is plan "
    "concatenation, no shuffle.",
    tags=("setops", "schema"),
)
def q_orders_union_schema_drift(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    new = o.filter(F.year("o_orderdate") >= 1998).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    legacy = o.filter(F.year("o_orderdate") < 1998).select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderstatus").alias("legacy_status"),
    )
    return new.unionByName(legacy, allowMissingColumns=True)
