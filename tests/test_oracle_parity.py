"""Local replica of the driver's t2 correctness gate: every registered query
with an oracle must hash-match DuckDB at sf0.01; rows-only queries must run."""

from __future__ import annotations

import pytest

from mapreduce_paradigm_spark.oracle import compare_query
from mapreduce_paradigm_spark.registry import all_specs

from .conftest import SF_CORRECT


def _names() -> list[str]:
    return sorted(all_specs())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    result = compare_query(spark, name, SF_CORRECT)
    assert result.ok, f"{name}: {result.detail}"
