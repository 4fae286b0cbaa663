"""Source/sink surface as driver-checkable queries.

The 14-format reader/writer library (``sources/files.py``) was previously
exercised only by pytest — invisible to the driver's oracle gate. These
queries make the ingest paths first-class gate rows via WRITE→READ
roundtrips: each builder derives deterministic file content from a parquet
fixture table, pushes it through the real sink+source code, and returns a
result whose oracle is plain SQL over the ORIGINAL table — so a parse bug
anywhere in the roundtrip breaks the value hash.

Scale note: the roundtrips run on the small dimension tables (nation,
region) or one projected fact (customer); the sources themselves are
line-splittable scans (CSV/fixed-width) that parallelize by file split at
100 TB — the plumbing under test is exactly the at-scale code path, only
the fixture is small. Temp dirs come from ``tempfile.mkdtemp`` (unique per
build; content deterministic, so value hashes are stable across runs).

Reference: the reference engine reads newline-delimited text files
(src/main.cpp:96-117); CSV/fixed-width/JSON are that surface generalized
to schema-bearing layouts.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from mapreduce_paradigm_spark.registry import register
from mapreduce_paradigm_spark.sources.tables import load_table


@register(
    "source_fixed_width_roundtrip",
    oracle="""
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       n_name,
       CAST(n_regionkey AS BIGINT) AS n_regionkey
FROM nation
""",
    description="Fixed-width (COBOL/mainframe layout) sink+source "
    "roundtrip: nation formatted into 37-char records via format_string, "
    "written as text, re-parsed by read_fixed_width's substring/try_cast "
    "projection (sources/files.py:310 — no UDF, whole-stage codegen). The "
    "oracle is the original table, so any padding/offset/cast defect in "
    "the reader breaks the hash.",
    tags=("source", "sink", "roundtrip"),
)
def q_source_fixed_width_roundtrip(spark, sf_dir):
    from mapreduce_paradigm_spark.sources.files import read_fixed_width

    out_dir = os.path.join(tempfile.mkdtemp(prefix="fw_rt_"), "nation_fw")
    nation = load_table(spark, sf_dir, "nation")
    lines = nation.select(
        F.format_string(
            "%-6d%-25s%-6d", "n_nationkey", "n_name", "n_regionkey"
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out_dir)
    return read_fixed_width(
        spark,
        out_dir,
        [
            ("n_nationkey", 1, 6, "BIGINT"),
            ("n_name", 7, 25, "STRING"),
            ("n_regionkey", 32, 6, "BIGINT"),
        ],
    )


@register(
    "source_csv_quarantine_roundtrip",
    oracle="""
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       c_name,
       CASE WHEN c_custkey % 7 = 3 THEN NULL
            ELSE CAST(round(c_acctbal * 100, 0) AS BIGINT) END AS acctbal_cents,
       CAST(CASE WHEN c_custkey % 7 = 3 THEN 1 ELSE 0 END AS BIGINT)
         AS quarantined
FROM customer
""",
    description="Quarantine-CSV ingest roundtrip: customer serialized to "
    "CSV with every (custkey % 7 == 3) row's acctbal field deterministically "
    "corrupted, re-read through read_csv_quarantine "
    "(sources/files.py:39, PERMISSIVE + columnNameOfCorruptRecord). "
    "Certifies the 100 TB ingest posture end-to-end: parseable fields of a "
    "bad row survive, the malformed field nulls, and the row is flagged — "
    "never a killed job, never a silently dropped row. Money compared in "
    "integer cents (registry hash-stability discipline).",
    tags=("source", "sink", "roundtrip", "quarantine"),
)
def q_source_csv_quarantine_roundtrip(spark, sf_dir):
    from mapreduce_paradigm_spark.sources.files import read_csv_quarantine

    out_dir = os.path.join(tempfile.mkdtemp(prefix="csvq_rt_"), "customer_csv")
    cust = load_table(spark, sf_dir, "customer")
    lines = cust.select(
        F.format_string(
            "%d,%s,%s",
            "c_custkey",
            "c_name",
            F.when(
                F.col("c_custkey") % 7 == 3, F.lit("NOT_A_NUMBER")
            ).otherwise(F.format_string("%.2f", "c_acctbal")),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out_dir)
    parsed = read_csv_quarantine(
        spark,
        out_dir,
        "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE",
        header=False,
    )
    return parsed.select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("acctbal_cents"),
        F.col("_corrupt_record").isNotNull().cast("bigint").alias("quarantined"),
    )


@register(
    "source_json_multiline_roundtrip",
    oracle="""
SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
FROM region
""",
    description="Multiline-JSON (REST-dump layout) source roundtrip: the "
    "region dimension written as ONE pretty-printed JSON array document "
    "(the non-splittable layout; driver-side collect is 5 rows by fixture "
    "contract — a dimension, never a fact) and re-parsed by "
    "read_json_multiline (sources/files.py:88, schema-explicit, one task "
    "per file — the many-small-files pattern at scale).",
    tags=("source", "roundtrip", "json"),
)
def q_source_json_multiline_roundtrip(spark, sf_dir):
    from mapreduce_paradigm_spark.sources.files import read_json_multiline

    rows = (
        load_table(spark, sf_dir, "region")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
        .collect()
    )
    doc = json.dumps(
        [{"r_regionkey": r.r_regionkey, "r_name": r.r_name} for r in rows],
        indent=2,
    )
    d = tempfile.mkdtemp(prefix="mljson_rt_")
    path = os.path.join(d, "regions.json")
    with open(path, "w") as f:
        f.write(doc)
    return read_json_multiline(
        spark, path, "r_regionkey BIGINT, r_name STRING"
    )


@register(
    "source_partitioned_roundtrip",
    oracle="""
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS acctbal_cents
FROM customer
WHERE c_mktsegment = 'BUILDING'
GROUP BY 1
""",
    description="Hive-partitioned parquet sink+source roundtrip WITH "
    "partition pruning: customer written partitionBy(c_mktsegment) — the "
    "directory-per-value layout every 100 TB lake uses — read back with "
    "an equality filter on the partition column and aggregated per "
    "nation. The filter resolves at PLANNING time against directory "
    "names (PartitionFilters in the scan, pinned by "
    "tests/test_plans.py::test_partitioned_roundtrip_prunes_partitions), "
    "so only 1 of 5 segment directories is ever listed or read — the "
    "mechanism that turns a predicate into a 5x I/O cut here and an "
    "arbitrarily large one on date-partitioned production tables. The "
    "oracle aggregates the ORIGINAL table under the same predicate, so "
    "a row lost or duplicated by the partitioned write/read path breaks "
    "the value hash.",
    tags=("source", "sink", "roundtrip", "layout"),
)
def q_source_partitioned_roundtrip(spark, sf_dir):
    out_dir = os.path.join(tempfile.mkdtemp(prefix="part_rt_"), "customer_part")
    cust = load_table(spark, sf_dir, "customer")
    cust.select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    ).write.mode("overwrite").partitionBy("c_mktsegment").parquet(out_dir)
    back = spark.read.parquet(out_dir).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    return back.groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).alias(
            "acctbal_cents"
        ),
    )
