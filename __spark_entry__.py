"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``mapreduce_paradigm_spark`` package: every implemented
operator from SURVEY.md §2 registers a QuerySpec (Spark builder + DuckDB
oracle SQL) in ``mapreduce_paradigm_spark.registry``; this module just
exposes the registry in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_paradigm_spark.registry import all_specs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship inverted-index query on sf0.001 (SURVEY.md §2.A)."""
    specs = all_specs()
    return specs["inverted_index"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted for non-SQL-expressible
    ops (driver then records the weaker rows-only check)."""
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
