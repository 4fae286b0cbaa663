"""Manifest-driven text scan — the reference's O1/O2 operators.

Reference semantics (cited into /root/reference):
- manifest: line 1 = file count, then one whitespace-delimited filename per
  line; each filename gets a **1-based** doc index in manifest order
  (``src/main.cpp:334-345``).
- each listed file is read line-by-line; a **missing file is silently treated
  as empty** — no error, exit 0 (``src/main.cpp:232-238``, no is_open check).

Spark-first realization: the manifest itself is metadata (a file list), so it
is parsed driver-side; the *data* is read with one distributed
``spark.read.text`` over all existing paths, and rows are mapped back to
doc ids via ``input_file_name()`` joined against a (path → doc_id) mapping
DataFrame. This scales to millions of files (Spark lists/splits them across
executors); nothing per-file happens on the driver beyond the path list.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Parse the manifest into a DataFrame ``(name STRING, doc_id INT)``.

    doc_id is 1-based in manifest order (reference ``src/main.cpp:340-344``).
    The declared count on line 1 caps how many names are consumed, matching
    the reference's ``for i in 1..count`` read loop.
    """
    with open(manifest_path, encoding="utf-8") as fh:
        tokens = fh.read().split()
    if not tokens:
        count, names = 0, []
    else:
        count = int(tokens[0])
        names = tokens[1 : 1 + count]
    rows = [(name, i + 1) for i, name in enumerate(names)]
    return spark.createDataFrame(rows, schema="name STRING, doc_id INT")


def read_documents_from_manifest(
    spark: SparkSession, manifest_path: str, base_dir: str | None = None
) -> DataFrame:
    """Produce ``(doc_id INT, text STRING)`` with one row per *line* of each
    manifest-listed file (reference reads line-by-line, ``src/main.cpp:238``).

    Missing files contribute no rows — the reference's silent-empty semantics
    (``src/main.cpp:232``). Downstream operators treat doc granularity via
    doc_id, so line-level rows are the natural distributed unit.
    """
    base = base_dir or os.path.dirname(os.path.abspath(manifest_path))
    manifest = read_manifest(spark, manifest_path)
    entries = [(r["name"], r["doc_id"]) for r in manifest.collect()]

    mapping_rows = []
    paths = []
    for name, doc_id in entries:
        p = Path(name) if os.path.isabs(name) else Path(base) / name
        if p.is_file():
            uri = p.resolve().as_uri()
            mapping_rows.append((uri, doc_id))
            paths.append(str(p))
    if not paths:
        return spark.createDataFrame([], schema="doc_id INT, text STRING")

    mapping = spark.createDataFrame(mapping_rows, schema="uri STRING, doc_id INT")
    lines = spark.read.text(paths).withColumn("uri", F.input_file_name())
    return (
        lines.join(F.broadcast(mapping), "uri")
        .select("doc_id", F.col("value").alias("text"))
    )
