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


def _driver_boundary_sort(pdf: pd.DataFrame) -> None:
    """Replicate the DRIVER's canonicalization on the RAW collected frame:
    a multi-column pandas ``sort_values`` over all columns. Multi-column
    sorts factorize each key through a hash table, so any unhashable cell
    (list / dict / numpy array — i.e. an un-rendered ARRAY or MAP column
    at the registry boundary) raises ``TypeError: unhashable type`` here,
    exactly as it did in the driver for round 8's ``embedding_pca_project``
    red row. Our own ``_canonical`` stringifies values BEFORE sorting and
    therefore never crashes — which is why the round-8 pre-flight sim
    green-lit a query the real driver rejected. This check runs on every
    compare (full-oracle AND rows-only) so a boundary-unsafe schema fails
    in pytest before the driver ever sees it (round-8 verdict ask #1)."""
    if len(pdf.columns) == 0:
        return
    try:
        pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    # multi-column sorts factorize (hash) → TypeError on list/dict/ndarray
    # cells; a SINGLE-column sort skips factorize and instead raises
    # ValueError ('truth value of an array is ambiguous') on ndarray cells
    # — same boundary defect, different pandas path
    except (TypeError, ValueError) as exc:
        raise TypeError(
            "driver-boundary check: output is not canonicalizable by the "
            "driver's raw pandas sort (un-rendered ARRAY/MAP/STRUCT column "
            "at the registry boundary? render with array_join / to_json "
            f"per the house convention): {exc}"
        ) from exc


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
        # mirror the driver: COLLECT the result and run its raw
        # canonicalizing sort — df.count() alone green-lit round 8's
        # boundary-unsafe pca output that crashed the real driver
        pdf = spec.builder(spark, sf_dir).toPandas()
        _driver_boundary_sort(pdf)
        return CompareResult(name, True, f"rows-only check: {len(pdf)} rows")

    spark_pdf = spec.builder(spark, sf_dir).toPandas()
    _driver_boundary_sort(spark_pdf)
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
