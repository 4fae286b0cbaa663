"""Streaming parity + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_paradigm_spark.operators.index import postings
from mapreduce_paradigm_spark.operators.multimodal import (
    decode_image,
    extract_features,
    with_binary_payload,
)
from mapreduce_paradigm_spark.sources.tables import load_table
from mapreduce_paradigm_spark.streaming import (
    incremental_index_foreachbatch,
    run_to_memory,
    windowed_counts_with_watermark,
)

from .conftest import SF_CORRECT, SF_SMOKE


def test_incremental_foreachbatch_matches_batch(spark, tmp_path):
    state = str(tmp_path / "index_state")
    incremental_index_foreachbatch(spark, SF_SMOKE, state)
    streamed = spark.read.parquet(state)
    batch = postings(load_table(spark, SF_SMOKE, "documents"))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_watermark_append_subset_of_complete(spark):
    appended = run_to_memory(
        windowed_counts_with_watermark(spark, SF_SMOKE), output_mode="append"
    )
    # append emits only watermark-closed windows: subset of all hourly counts
    ev = load_table(spark, SF_SMOKE, "events")
    complete = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    extra = appended.withColumn(
        "hour_start", F.col("hour_start").cast("timestamp_ntz")
    ).exceptAll(complete)
    assert extra.count() == 0
    assert appended.count() > 0


def test_multimodal_features_deterministic(spark):
    import zlib

    docs = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "börek")], "doc_id BIGINT, text STRING"
    )
    rows = {r["doc_id"]: r for r in extract_features(with_binary_payload(docs)).collect()}
    payload = "hello".encode()
    assert rows[1]["n_bytes"] == 5
    assert rows[1]["crc32"] == zlib.crc32(payload)
    assert rows[1]["head_hex"] == payload[:8].hex()
    assert rows[1]["byte_mean"] == pytest.approx(sum(payload) / 5)
    assert rows[2]["n_bytes"] == 0 and rows[2]["byte_mean"] == 0.0
    assert rows[3]["n_bytes"] == len("börek".encode())  # utf-8 bytes, not chars


def test_decode_image_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")


def test_binary_duplicate_groups(spark):
    """md5-of-payload exact dedup over opaque binary columns (round 12):
    byte-identical payloads group with the keep-min policy; near-identical
    bytes (one bit off) do NOT group — no normalization on opaque blobs.
    Σ n_copies recovers the corpus and the hash matches hashlib."""
    import hashlib

    from mapreduce_paradigm_spark.operators.multimodal import (
        binary_duplicate_groups,
    )

    docs = spark.createDataFrame(
        [
            (1, "same-bytes"),
            (2, "same-bytes"),
            (7, "same-bytes"),
            (3, "same-bytes "),  # trailing space: different blob, no group
            (4, "Same-bytes"),  # case: different blob (no normalization)
            (5, ""),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r["payload_md5"]: r
        for r in binary_duplicate_groups(with_binary_payload(docs)).collect()
    }
    key = hashlib.md5(b"same-bytes").hexdigest()
    assert got[key]["keep_doc_id"] == 1 and got[key]["n_copies"] == 3
    assert len(got) == 4
    assert sum(r["n_copies"] for r in got.values()) == 6
    singles = [h for h, r in got.items() if r["n_copies"] == 1]
    assert len(singles) == 3


def test_arrow_featurizer_matches_pandas(spark):
    """mapInArrow twin must be row-identical to the mapInPandas featurizer."""
    from mapreduce_paradigm_spark.operators.multimodal import extract_features_arrow
    from mapreduce_paradigm_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents").limit(200)
    media = with_binary_payload(docs)
    pandas_rows = sorted(map(tuple, extract_features(media).collect()))
    arrow_rows = sorted(map(tuple, extract_features_arrow(media).collect()))
    assert arrow_rows == pandas_rows
    assert len(arrow_rows) > 0


def test_binary_dir_source_feeds_featurizer(spark, tmp_path):
    """binaryFile landing zone → featurizer plumbing: glob prunes at listing
    time, content bytes round-trip exactly."""
    from pyspark.sql import functions as F

    from mapreduce_paradigm_spark.operators.multimodal import extract_features
    from mapreduce_paradigm_spark.sources.files import read_binary_dir

    payloads = {i: bytes([i * 7 % 256]) * (10 + i) for i in range(5)}
    for i, b in payloads.items():
        (tmp_path / f"doc{i}.img").write_bytes(b)
    (tmp_path / "ignored.txt").write_text("not media")

    bf = read_binary_dir(spark, str(tmp_path), glob="*.img")
    assert bf.count() == 5  # the .txt never matched the listing
    media = bf.select(
        F.regexp_extract(F.col("path"), r"doc(\d+)\.img", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert set(feats) == set(payloads)
    for i, b in payloads.items():
        assert feats[i]["n_bytes"] == len(b)
        assert feats[i]["head_hex"] == b[:8].hex()


def test_continuous_rollup_restart_does_not_double_count(spark, tmp_path):
    """Exactly-once effect for the sum-merge foreachBatch sink comes from
    the streaming CHECKPOINT: restarting the query with the same checkpoint
    must not re-merge committed batches into the state. (A replay with a
    FRESH checkpoint would re-merge everything — which is why the state +
    checkpoint pair, not the state alone, is the unit of recovery.)"""
    from mapreduce_paradigm_spark.streaming import (
        continuous_minute_rollup_foreachbatch,
    )

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    continuous_minute_rollup_foreachbatch(spark, SF_SMOKE, state, ckpt)
    first = sorted(map(tuple, spark.read.parquet(state).collect()))
    # restart with the SAME checkpoint: all batches already committed
    continuous_minute_rollup_foreachbatch(spark, SF_SMOKE, state, ckpt)
    second = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert first == second


def test_state_promotion_survives_crash_at_every_step(spark, tmp_path):
    """Round-3 advisory regression pin: the old delete-then-move state swap
    lost the ENTIRE state table if interrupted between the two steps. The
    rename-aside protocol (_promote_state) + fallback reader (_read_state)
    must recover the previous-or-next state from a crash at ANY single
    step: after rename-aside (live dir missing), and after promote (aside
    dir still present)."""
    import os
    import shutil

    from mapreduce_paradigm_spark.streaming import _promote_state, _read_state

    state = str(tmp_path / "state")

    def write(path, vals):
        spark.createDataFrame([(v,) for v in vals], "v BIGINT").coalesce(
            1
        ).write.mode("overwrite").parquet(path)

    # normal promotion: v1 live -> v2 staged -> promoted
    write(state, [1])
    write(state + "_next", [2])
    _promote_state(state)
    assert sorted(r["v"] for r in _read_state(spark, state).collect()) == [2]
    assert not os.path.exists(state + "_old")

    # crash AFTER rename-aside, BEFORE promote: live dir is gone, aside
    # holds v2, _next holds the fully-written v3 — reader must fall back
    # to the aside copy (the state v3 was derived from)
    write(state + "_next", [3])
    shutil.rmtree(state + "_old", ignore_errors=True)
    os.rename(state, state + "_old")  # simulate the partial promotion
    got = sorted(r["v"] for r in _read_state(spark, state).collect())
    assert got == [2], "reader must recover the aside copy"
    # recovery completes by re-running the promotion
    _promote_state(state)
    assert sorted(r["v"] for r in _read_state(spark, state).collect()) == [3]

    # crash AFTER promote, BEFORE aside cleanup: live v4, stale aside v3 —
    # reader must prefer the live dir, and the next promotion must not trip
    # over the leftover aside dir
    write(state + "_next", [4])
    _promote_state(state)
    write(state + "_aside_sim", [0])  # noise dir, ignored
    os.rename(state + "_aside_sim", state + "_old")
    assert sorted(r["v"] for r in _read_state(spark, state).collect()) == [4]
    write(state + "_next", [5])
    _promote_state(state)
    assert sorted(r["v"] for r in _read_state(spark, state).collect()) == [5]
