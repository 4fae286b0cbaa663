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
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries
    (grouping sets etc.) can reference them by name."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
