"""Golden-output differential test against the reference binary's observed
behavior (FIXTURES.md §3: corpus + exact per-letter files captured from a
survey run of /root/reference built per src/Makefile:2)."""

from __future__ import annotations

import string

from pyspark.sql import functions as F

from mapreduce_paradigm_spark.operators.index import inverted_index, letter_ranked
from mapreduce_paradigm_spark.sinks import write_reference_layout
from mapreduce_paradigm_spark.sources.text import read_documents_from_manifest

# FIXTURES.md §3 corpus: doc1 = rows 1+2, doc2 = row 3 (two lines), doc3 = row 4.
DOCS = {
    "doc1.txt": "The quick brown Fox jumps over the lazy dog!\ndon't stop... 123 45abc the THE tHe",
    "doc2.txt": "apple banana the fox\nzebra  zebra zebra",
    "doc3.txt": "apple Apple APPLE's",
}

# FIXTURES.md §3 golden outputs (reference binary, observed).
GOLDEN = {
    "a": ["apple:[2 3]", "abc:[1]", "apples:[3]"],
    "b": ["banana:[2]", "brown:[1]"],
    "d": ["dog:[1]", "dont:[1]"],
    "f": ["fox:[1 2]"],
    "j": ["jumps:[1]"],
    "l": ["lazy:[1]"],
    "o": ["over:[1]"],
    "q": ["quick:[1]"],
    "s": ["stop:[1]"],
    "t": ["the:[1 2]"],
    "z": ["zebra:[2]"],
}


def _write_corpus(tmp_path, with_missing=False):
    for name, text in DOCS.items():
        (tmp_path / name).write_text(text, encoding="utf-8")
    names = list(DOCS) + (["ghost.txt"] if with_missing else [])
    manifest = tmp_path / "manifest.txt"
    manifest.write_text(f"{len(names)}\n" + "\n".join(names) + "\n", encoding="utf-8")
    return str(manifest)


def test_flagship_matches_reference_golden(spark, tmp_path):
    manifest = _write_corpus(tmp_path)
    docs = read_documents_from_manifest(spark, manifest)
    idx = letter_ranked(inverted_index(docs))
    rows = idx.select(
        "letter",
        "rank_in_letter",
        F.format_string("%s:[%s]", "word", F.array_join("doc_ids", " ")).alias("rec"),
    ).collect()
    got: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["letter"], r["rank_in_letter"])):
        got.setdefault(r["letter"], []).append(r["rec"])
    assert got == GOLDEN


def test_missing_file_silently_empty(spark, tmp_path):
    # Reference: missing manifest entries contribute nothing, no error
    # (src/main.cpp:232, no is_open check [observed]).
    manifest = _write_corpus(tmp_path, with_missing=True)
    docs = read_documents_from_manifest(spark, manifest)
    idx = inverted_index(docs)
    all_ids = sorted(
        {i for r in idx.select(F.explode("doc_ids").alias("d")).collect() for i in [r["d"]]}
    )
    assert all_ids == [1, 2, 3]  # ghost doc_id 4 absent everywhere


def test_reference_sink_layout(spark, tmp_path):
    manifest = _write_corpus(tmp_path)
    out = tmp_path / "out"
    docs = read_documents_from_manifest(spark, manifest)
    write_reference_layout(inverted_index(docs), str(out))
    # all 26 files exist, even empty ones (src/main.cpp:161-162 [observed])
    for letter in string.ascii_lowercase:
        path = out / f"{letter}.txt"
        assert path.is_file(), f"missing {letter}.txt"
        lines = [l for l in path.read_text().splitlines() if l]
        assert lines == GOLDEN.get(letter, []), f"{letter}.txt content mismatch"


def test_normalization_edge_cases(spark):
    # don't→dont, 45abc→abc, digits dropped, non-ASCII stripped
    # (src/main.cpp:191-208 [observed]).
    from mapreduce_paradigm_spark.functions import doc_words

    df = spark.createDataFrame(
        [(1, "don't 123 45abc émigré café naïve")], "doc_id INT, text STRING"
    )
    words = sorted(r["word"] for r in doc_words(df).collect())
    assert words == sorted(["dont", "abc", "migr", "caf", "nave"])


def test_python_datasource_matches_composed_scan(spark, tmp_path):
    """The Spark-4 Python DataSource form of O1/O2 (sources/pyds.py) must
    produce exactly the composed spark.read.text scan's rows, including the
    missing-file-silent quirk."""
    from mapreduce_paradigm_spark.sources.pyds import RefManifestDataSource

    manifest = _write_corpus(tmp_path, with_missing=True)
    spark.dataSource.register(RefManifestDataSource)
    via_ds = (
        spark.read.format("ref_manifest").option("path", manifest).load()
    )
    via_composed = read_documents_from_manifest(spark, manifest)
    a = sorted((r["doc_id"], r["text"]) for r in via_ds.collect())
    b = sorted((r["doc_id"], r["text"]) for r in via_composed.collect())
    assert a == b and a  # identical and non-empty
