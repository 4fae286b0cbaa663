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
    """Column-pruning check: EVERY scan node whose Location matches
    ``table_fragment`` must have a ReadSchema ⊆ ``allowed``.

    Parsed per node block (formatted explain groups each operator's
    attributes under its ``(n) OpName`` header), so a pruned ReadSchema from
    a DIFFERENT table's scan can neither satisfy nor mask the check."""
    import re

    plan = formatted_plan(df)
    blocks: list[list[str]] = []
    cur: list[str] | None = None
    for line in plan.splitlines():
        if re.match(r"^\(\d+\) ", line):
            cur = []
            blocks.append(cur)
        if cur is not None:
            cur.append(line)
    found = False
    for block in blocks:
        if "Scan" not in block[0]:
            continue
        if not any(table_fragment in ln for ln in block if "Location" in ln or "file" in ln):
            continue
        for ln in block:
            if "ReadSchema" not in ln:
                continue
            found = True
            cols = ln.split("struct<", 1)[-1]
            names = {c.split(":")[0].strip() for c in cols.rstrip(">").split(",") if ":" in c}
            if not names or not (names <= allowed):
                return False
    return found


def observe_counts(df: DataFrame, name: str = "audit"):
    """Attach zero-cost observable metrics to a DataFrame: returns
    ``(df', observation)`` where ``observation.get`` yields the audit
    counters (row count here; add any aggregate expression) AFTER the next
    action on ``df'``. Metrics ride the existing execution — no second
    scan, no accumulator races (Spark dedups task retries for observe,
    unlike raw accumulators) — which is how a 100 TB pipeline records
    rows-in/rows-out/nulls-quarantined per stage without paying for a
    count() pass. The pytest in tests/test_pipeline_ops.py pins the
    contract."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs
