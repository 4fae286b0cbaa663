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
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship inverted-index query on sf0.001 (SURVEY.md §2.A)."""
    specs = all_specs()
    return specs["inverted_index"].builder(spark, SMOKE_SF_DIR)


def _gate_priority() -> dict[str, tuple[int, int]]:
    """(times_passed, times_seen) per query across past CORRECTNESS_r*.json.

    The round-1 gate recorded only the first 50 registry entries, so the
    registry order IS the verification budget.  Ordering least-verified-first
    means every round the driver spends its budget on queries that still lack
    a green row, converging to full coverage even under a per-round cap.
    """
    import glob
    import json

    passed: dict[str, int] = {}
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            seen[name] = seen.get(name, 0) + 1
            ok = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                passed[name] = passed.get(name, 0) + 1
    return {n: (passed.get(n, 0), seen.get(n, 0)) for n in seen}


def _ordered_specs():
    specs = all_specs()
    prio = _gate_priority()
    names = list(specs)
    reg_index = {n: i for i, n in enumerate(names)}
    names.sort(key=lambda n: (*prio.get(n, (0, 0)), reg_index[n]))
    return [(n, specs[n]) for n in names]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-driver-verified first (see _gate_priority)."""
    return {name: spec.builder for name, spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted for non-SQL-expressible
    ops (driver then records the weaker rows-only check)."""
    return {name: spec.oracle for name, spec in _ordered_specs() if spec.oracle is not None}
