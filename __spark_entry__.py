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
    """(last_seen_round, times_passed) per query across CORRECTNESS_r*.json.

    The driver's gate verifies ~50 entries per round in the order this
    module yields them, so the ordering IS the verification budget.  Sorting
    by (last round a query was checked, ascending) gives BOTH properties a
    converging gate needs:

    - never-checked queries (last_seen_round 0) lead every round, so new
      registrations and the long tail reach full coverage first;
    - already-green queries rotate back through the gate stalest-first
      instead of never again, so a regression to a previously-passed query
      (e.g. a semantics change after its only green row) is caught within
      ~ceil(N/50) rounds rather than escaping indefinitely.
    """
    import glob
    import json
    import re

    last_round: dict[str, int] = {}
    passed: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
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
            last_round[name] = max(last_round.get(name, 0), rnd)
            ok = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                passed[name] = passed.get(name, 0) + 1
    return {n: (last_round[n], passed.get(n, 0)) for n in last_round}


# Gate priority overrides: names pinned to the FRONT of the gate queue when
# they would otherwise sort behind the never-checked group (e.g. a stale
# green row that hashed an older semantics). All round-3 pins landed fresh
# green rows in CORRECTNESS_r03 and were dropped; empty means pure
# staleness-first ordering.
#
# Round 8: the round-7 pin (nation_balance_bh_fdr) landed its green row in
# CORRECTNESS_r07 and is dropped — back to pure staleness-first ordering.
#
# Round 10: the round-9 pin (embedding_pca_project) landed its clean
# rows-only row in CORRECTNESS_r09 and is dropped — back to pure
# staleness-first ordering.
_GATE_BACKLOG: tuple[str, ...] = ()


def _registration_age() -> dict[str, int]:
    """name -> first-registration rank from the committed append-only
    ledger REGISTRY_AGE.txt. Within the never-checked group the tiebreak
    must be how LONG a query has waited, not module import order — a new
    module imported early would otherwise queue its fresh registrations
    ahead of queries that have waited since round 1 (the round-3 verdict's
    queue-jumping hazard). New names are appended to the ledger when
    registered; names missing from it sort last (newest)."""
    path = os.path.join(_REPO_ROOT, "REGISTRY_AGE.txt")
    try:
        with open(path) as f:
            return {line.strip(): i for i, line in enumerate(f) if line.strip()}
    except OSError:
        return {}


def _ordered_specs():
    specs = all_specs()
    prio = _gate_priority()
    age = _registration_age()
    names = list(specs)
    reg_index = {n: i for i, n in enumerate(names)}
    names.sort(
        key=lambda n: (
            n not in _GATE_BACKLOG,
            # NEVER-checked queries lead regardless of oracle kind: round-7
            # verdict ask #2 wants every registered query driver-certified
            # at least once (a rows-only spec's `no_oracle` row still
            # certifies it builds and returns rows in the driver's plain
            # session). Within the never-checked group, full-oracle specs
            # go first — their rows carry the hard hash signal.
            prio.get(n, (0, 0))[0] > 0,
            # among ALREADY-checked queries rotating stalest-first,
            # rows-only specs (oracle is None) sort LAST: a repeat driver
            # row for them can only re-record `err: no_oracle`, so every
            # rotation slot they occupy is budget taken from a
            # hash-checkable query (round-4 verdict ask #3 — 14 slots were
            # burned that way). Their hard checks live in pytest
            # (recall/accuracy/determinism pins) and in the companion
            # *_check invariant queries, which DO carry full oracles and
            # flow through the normal rotation.
            specs[n].oracle is None,
            *prio.get(n, (0, 0)),
            age.get(n, len(age)),
            reg_index[n],
        )
    )
    return [(n, specs[n]) for n in names]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-driver-verified first (see _gate_priority)."""
    return {name: spec.builder for name, spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted for non-SQL-expressible
    ops (driver then records the weaker rows-only check)."""
    return {name: spec.oracle for name, spec in _ordered_specs() if spec.oracle is not None}
