"""Sinks — including the reference's 26-per-letter text layout (O11).

Reference format (/root/reference/src/main.cpp:161-179): one file per
initial letter, records ``word:[i1 i2 … ik]`` (space-separated ascending doc
ids, no trailing space), ordered df desc then word asc (src/main.cpp:83-91);
all 26 files exist even when empty [observed: 0-byte files].
"""

from __future__ import annotations

import os
import string

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_index_records(index: DataFrame) -> DataFrame:
    """``(letter, value)`` where value = ``word:[i1 i2 …]`` (src/main.cpp:167-176)."""
    return index.select(
        F.substring("word", 1, 1).alias("letter"),
        F.format_string(
            "%s:[%s]", F.col("word"), F.array_join(F.col("doc_ids"), " ")
        ).alias("value"),
        F.col("df"),
        F.col("word"),
    )


def write_letter_partitioned(index: DataFrame, out_dir: str) -> None:
    """Scale path: hive-partitioned text, ``out_dir/letter=a/…``.

    ``repartition(letter)`` + ``sortWithinPartitions`` gives each letter a
    contiguous, correctly ordered run — the Spark form of the reference's
    per-letter sorted extraction (src/main.cpp:55-94). Partition pruning on
    ``letter`` replaces the reference's early-exit on sorted keys
    (src/main.cpp:72-75).
    """
    (
        format_index_records(index)
        .repartition("letter")
        .sortWithinPartitions("letter", F.desc("df"), F.asc("word"))
        .select("letter", "value")
        .write.partitionBy("letter")
        .mode("overwrite")
        .text(out_dir)
    )


def write_reference_layout(index: DataFrame, out_dir: str) -> None:
    """Exact reference layout: files ``a.txt`` … ``z.txt``, all 26 created
    even when empty (src/main.cpp:161-162 [observed]).

    Test/parity utility for small corpora: the 26-way grouped collect runs
    distributed, but final file assembly is driver-side (the reference is
    itself a single-node writer). Use ``write_letter_partitioned`` at scale.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows = (
        format_index_records(index)
        .filter(F.col("letter").rlike("^[a-z]$"))
        .groupBy("letter")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct((-F.col("df")).alias("neg_df"), "word", "value"))
                    ),
                    lambda s: s["value"],
                ),
                "\n",
            ).alias("body")
        )
        .collect()
    )
    bodies = {r["letter"]: r["body"] for r in rows}
    for letter in string.ascii_lowercase:
        body = bodies.get(letter, "")
        with open(os.path.join(out_dir, f"{letter}.txt"), "w", encoding="utf-8") as fh:
            fh.write(body + "\n" if body else "")
