"""Parquet table sources for the driver testdata star schema (TESTDATA.md).

The reference's only sources are a manifest + raw text files
(``src/main.cpp:294-345``); the generalized engine adds columnar parquet
scans, which at 100 TB are the real input path: Spark's vectorized parquet
reader plus Catalyst predicate pushdown / column pruning do the heavy
lifting as long as plans stay declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Keep filters/projections on top of this so Catalyst
    pushes them into the parquet scan (check ``PushedFilters`` in explain)."""
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    outright (PARQUET_TYPE_ILLEGAL). Read it as raw int64 nanos
    (``nanosAsLong``) and rebuild a TIMESTAMP_NTZ with pure epoch arithmetic —
    no session-timezone dependence, so results are stable under any driver
    session config. Nanos→micros truncation is lossless here (source data is
    µs-precision)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    if isinstance(raw.schema["ts"].dataType, LongType):
        raw = raw.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return raw


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries
    (grouping sets etc.) can reference them by name."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
