"""Physical-plan inspection utilities — the feedback loop for the 100 TB
design posture. Tests assert that the plans Catalyst produces are the plans
we want: filters pushed into parquet scans, columns pruned, dims broadcast,
aggregates partial-before-shuffle, codegen fused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the parquet scan advertises PushedFilters containing every
    fragment (e.g. column names of pushed predicates)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and all(f in line for f in fragments):
            return True
    return False


def count_occurrences(df: DataFrame, token: str) -> int:
    return formatted_plan(df).count(token)


def reads_only_columns(df: DataFrame, table_fragment: str, allowed: set[str]) -> bool:
    """Column-pruning check: the scan's ReadSchema for the matching scan node
    must be a subset of ``allowed``."""
    plan = formatted_plan(df)
    ok = False
    for line in plan.splitlines():
        if "ReadSchema" in line and table_fragment in plan:
            cols = line.split("struct<", 1)[-1]
            names = {c.split(":")[0].strip() for c in cols.rstrip(">").split(",") if ":" in c}
            if names and names <= allowed:
                ok = True
    return ok
