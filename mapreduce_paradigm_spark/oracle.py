"""DuckDB oracle harness — a local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same parquet
tables and compares (column names, row count, order-insensitive values),
mirroring CORRECTNESS_r{N}.json semantics so mismatches surface in pytest
before the driver ever runs.
"""

from __future__ import annotations

from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from mapreduce_paradigm_spark.sources.tables import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, every value
    stringified (nulls → 'NULL'), rows sorted."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        series = df[col]
        df[col] = series.astype(object).where(series.notna(), None)
        df[col] = df[col].map(lambda v: "NULL" if v is None else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(
    spark: SparkSession, name: str, sf_dir: str, limit_diff: int = 5
) -> CompareResult:
    from mapreduce_paradigm_spark.registry import all_specs

    spec = all_specs()[name]
    if spec.oracle is None:
        df = spec.builder(spark, sf_dir)
        n = df.count()
        return CompareResult(name, True, f"rows-only check: {n} rows")

    spark_pdf = spec.builder(spark, sf_dir).toPandas()
    with duckdb_connection(sf_dir) as con:
        duck_pdf = con.sql(spec.oracle).df()

    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return CompareResult(
            name, False, f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
    if len(spark_pdf) != len(duck_pdf):
        return CompareResult(
            name, False, f"row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
        )
    a, b = _canonical(spark_pdf), _canonical(duck_pdf)
    neq = (a != b).any(axis=1)
    if neq.any():
        idx = list(neq[neq].index[:limit_diff])
        samples = [
            f"row {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}" for i in idx
        ]
        return CompareResult(name, False, f"{int(neq.sum())} mismatched rows; " + " | ".join(samples))
    return CompareResult(name, True, f"{len(a)} rows hash-equal")
