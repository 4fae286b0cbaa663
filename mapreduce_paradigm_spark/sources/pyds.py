"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) for the
reference's manifest-text format — O1/O2 as a PLUGGABLE source:

    spark.dataSource.register(RefManifestDataSource)
    spark.read.format("ref_manifest").option("path", manifest).load()

Same contract as ``sources/text.py read_documents_from_manifest`` (1-based
doc ids in manifest order, ``src/main.cpp:334-345``; a missing file reads as
silently empty, ``src/main.cpp:232-238``), re-expressed through Spark's
data-source SPI instead of composition over ``spark.read.text``:

- ``partitions()`` returns ONE InputPartition per manifest entry, so file
  reads distribute across executors exactly like the reference's dynamic
  per-file task queue (``src/main.cpp:216-225``) — the manifest itself stays
  driver-side metadata (a path list), never the data;
- ``read(partition)`` runs ON AN EXECUTOR and streams the file line by line
  (no whole-file materialization), emitting (doc_id, line) rows.

When to prefer which: the composed form (``spark.read.text`` +
``input_file_name`` join) keeps the scan JVM-side — columnar batches, no
Python boundary — and is the hot-path choice; the DataSource form is the
extension template for formats Spark has NO native reader for (the Python
rows cross via Arrow). Both are tested equal on the golden corpus.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _ManifestPartition(InputPartition):
    def __init__(self, doc_id: int, path: str):
        self.doc_id = doc_id
        self.path = path


class RefManifestReader(DataSourceReader):
    def __init__(self, options: dict):
        manifest_path = options.get("path")
        if not manifest_path:
            raise ValueError("ref_manifest requires .option('path', <manifest>)")
        base = options.get("base_dir") or os.path.dirname(
            os.path.abspath(manifest_path)
        )
        with open(manifest_path, encoding="utf-8") as fh:
            tokens = fh.read().split()
        count = int(tokens[0]) if tokens else 0
        names = tokens[1 : 1 + count]
        self._parts = [
            _ManifestPartition(
                i + 1,
                str(Path(name) if os.path.isabs(name) else Path(base) / name),
            )
            for i, name in enumerate(names)
        ]

    def partitions(self):
        return self._parts

    def read(self, partition: _ManifestPartition):
        try:
            fh = open(partition.path, encoding="utf-8")
        except OSError:
            return  # reference semantics: missing file == empty file
        with fh:
            for line in fh:
                yield (partition.doc_id, line.rstrip("\n"))


class RefManifestDataSource(DataSource):
    """``format("ref_manifest")`` — reference manifest corpus as a source."""

    @classmethod
    def name(cls) -> str:
        return "ref_manifest"

    def schema(self) -> str:
        return "doc_id INT, text STRING"

    def reader(self, schema) -> RefManifestReader:
        return RefManifestReader(self.options)
