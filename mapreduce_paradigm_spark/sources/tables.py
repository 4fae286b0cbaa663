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
    """events.ts carries naive wall-clock micros (parquet TIMESTAMP with
    isAdjustedToUTC=false; historical fixtures used TIMESTAMP(NANOS), which
    Spark's reader rejects outright — PARQUET_TYPE_ILLEGAL — hence the
    ``nanosAsLong`` branch). It MUST surface as TIMESTAMP_NTZ: every
    time-derivation in the registry (day casts, epoch bucketing) is
    session-timezone-independent only on NTZ input.

    Round-5 root cause of the round-4 exotic-TZ gate flake
    (``events_compaction_plan``, GATES_r04 tz_sweep rc 1): if
    ``spark.sql.parquet.inferTimestampNTZ.enabled`` is false (non-default,
    but one runtime ``conf.set`` away on the shared test session), ts
    resolves as session-zone LTZ and ``cast(ts AS DATE)`` shifts rows near
    UTC midnight under Australia/Lord_Howe — reproduced deterministically:
    31 days vs the oracle's 30. Defense in depth: the session default pins
    the conf true (session.py), this loader re-pins it immediately before
    the read, and the type is ASSERTED after the read so any future
    resolution drift is a loud TypeError instead of silent parity skew."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    if isinstance(raw.schema["ts"].dataType, LongType):
        raw = raw.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    ts_type = raw.schema["ts"].dataType
    if not isinstance(ts_type, TimestampNTZType):
        raise TypeError(
            f"events.ts resolved as {ts_type} instead of TIMESTAMP_NTZ; "
            "session-zone-dependent day/bucket derivations would silently "
            "diverge from the DuckDB oracles (see GATES_r04 tz_sweep flake)"
        )
    return raw


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries
    (grouping sets etc.) can reference them by name."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
