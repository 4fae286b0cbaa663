"""Driver-boundary schema lint (round-8 verdict ask #3).

The driver canonicalizes every collected result with a raw multi-column
pandas ``sort_values`` — which factorizes keys through a hash table and
CRASHES on unhashable cells (lists / dicts / numpy arrays). Round 8's
``embedding_pca_project`` shipped a raw ``ARRAY<DOUBLE>`` column to that
boundary and produced the first-ever red CORRECTNESS row (a harness
crash, not a wrong answer). The house convention is to render arrays as
strings (``array_join`` + fixed precision) at the registry boundary.

Two layers enforce it:

- this static lint: EVERY registered batch query's output schema must be
  free of top-level ArrayType / MapType (no whitelist — render
  everything);
- the dynamic mirror in ``oracle.compare_query``
  (``_driver_boundary_sort``): every compared result — full-oracle AND
  rows-only — is sorted exactly the way the driver sorts it, so a
  boundary-unsafe frame crashes in pytest before the driver sees it
  (streaming builders, skipped here because building them executes a
  multi-batch run, are covered by that dynamic layer via the default
  parity suite).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from mapreduce_paradigm_spark.registry import all_specs

from .conftest import SF_SMOKE


def test_no_toplevel_array_or_map_in_any_registered_output(spark):
    # StructType included: Arrow collects struct cells as dicts, which are
    # just as unhashable in the driver's factorizing sort as lists
    flagged = {}
    for name, spec in sorted(all_specs().items()):
        if name.startswith("streaming_"):
            continue  # executing builders; dynamic boundary check covers them
        schema = spec.builder(spark, SF_SMOKE).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            flagged[name] = bad
    assert not flagged, (
        "un-rendered ARRAY/MAP/STRUCT columns at the driver boundary "
        f"(array_join/to_json-render them): {flagged}"
    )


def test_boundary_sort_reproduces_the_r8_pca_crash(spark):
    """Regression pin for the sim gap: the RAW ``pca_project`` operator
    output (id, pc ARRAY<DOUBLE>) — exactly what round 8's registered
    query shipped — must make ``_driver_boundary_sort`` raise, proving
    the rebuilt sim catches what the r8 pre-flight sim green-lit. The
    registered query now renders ``pc`` as a string and passes."""
    from mapreduce_paradigm_spark.operators.similarity import pca_project
    from mapreduce_paradigm_spark.oracle import _driver_boundary_sort
    from mapreduce_paradigm_spark.sources.tables import load_table

    raw = pca_project(
        load_table(spark, SF_SMOKE, "embeddings"), n_components=2
    ).toPandas()
    with pytest.raises(TypeError, match="driver-boundary check"):
        _driver_boundary_sort(raw)

    rendered = (
        all_specs()["embedding_pca_project"].builder(spark, SF_SMOKE).toPandas()
    )
    _driver_boundary_sort(rendered)  # must NOT raise
    assert list(rendered.columns) == ["vec_id", "pc"]
    assert rendered["pc"].map(type).eq(str).all()
