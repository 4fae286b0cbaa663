"""Source/sink coverage: CSV + JSONL roundtrips, partitioned parquet sink
with pruning, and the bucketed-table shuffle elimination proof."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_paradigm_spark.plans import formatted_plan
from mapreduce_paradigm_spark.sources.files import (
    read_csv,
    read_jsonl,
    save_bucketed,
    write_csv,
    write_jsonl,
    write_parquet,
)
from mapreduce_paradigm_spark.sources.tables import load_table

from .conftest import SF_SMOKE

CUSTOMER_SCHEMA = (
    "c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, c_acctbal DOUBLE, "
    "c_mktsegment STRING"
)


def _customers(spark):
    return load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("c_custkey").collect()]


def test_csv_roundtrip(spark, tmp_path):
    src = _customers(spark)
    path = str(tmp_path / "cust_csv")
    write_csv(src, path)
    back = read_csv(spark, path, CUSTOMER_SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_jsonl_roundtrip(spark, tmp_path):
    src = _customers(spark)
    path = str(tmp_path / "cust_json")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, CUSTOMER_SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(src)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from mapreduce_paradigm_spark.plans import has_pushed_filters
    from mapreduce_paradigm_spark.sources.files import read_orc, write_orc

    src = _customers(spark)
    path = str(tmp_path / "cust_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert _sorted_rows(back) == _sorted_rows(src)
    # ORC scans take predicate pushdown just like parquet
    import pyspark.sql.functions as F

    assert has_pushed_filters(back.filter(F.col("c_custkey") == 7), "c_custkey")


def test_xml_roundtrip(spark, tmp_path):
    """Spark 4 native XML source: rowTag elements round-trip with an
    explicit schema (inference is loose for XML, so the contract is pinned
    schema-first like CSV/JSONL)."""
    from mapreduce_paradigm_spark.sources.files import read_xml, write_xml

    src = _customers(spark)
    path = str(tmp_path / "cust_xml")
    write_xml(src, path, row_tag="customer", root_tag="customers")
    back = read_xml(spark, path, row_tag="customer", schema=CUSTOMER_SCHEMA).select(
        *src.columns
    )
    assert _sorted_rows(back) == _sorted_rows(src)


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    src = _customers(spark)
    path = str(tmp_path / "cust_parq")
    write_parquet(src, path, partition_by=["c_mktsegment"])
    # hive layout exists
    segs = [d for d in os.listdir(path) if d.startswith("c_mktsegment=")]
    assert len(segs) >= 2
    back = spark.read.parquet(path)
    one = back.filter(F.col("c_mktsegment") == "BUILDING")
    plan = formatted_plan(one)
    # partition pruning: the segment filter is a partition filter, not a scan
    # of all segments (the scale form of the reference's per-letter early
    # exit, src/main.cpp:72-75)
    assert "PartitionFilters" in plan and "c_mktsegment" in plan.split("PartitionFilters", 1)[1][:200]
    expected = src.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert one.count() == expected


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the shuffle: the
    SortMergeJoin reads bucket-aligned files directly. This is the
    pay-the-shuffle-once design for keys joined in every query."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        cust = _customers(spark)
        orders = load_table(spark, SF_SMOKE, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        save_bucketed(cust, "cust_b", "c_custkey", 8)
        save_bucketed(
            orders.withColumnRenamed("o_custkey", "c_custkey"), "orders_b", "c_custkey", 8
        )
        joined = spark.table("cust_b").join(spark.table("orders_b"), "c_custkey")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == cust.join(
            orders, cust.c_custkey == orders.o_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS cust_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")
