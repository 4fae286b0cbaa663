"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The decode step itself is STUBBED: the image/audio libraries are not in this
container, so ``decode_image``/``decode_audio`` raise NotImplementedError
unless the optional dependency imports. What IS real and tested:

- the schema convention (``payload BINARY`` + metadata struct columns),
- the ``mapInPandas`` plumbing (Arrow batch shape, schema declaration,
  partition-preserving execution),
- a deterministic fallback featurizer (byte stats + crc32) so pipelines are
  exercisable end-to-end without the heavy deps.

At 100 TB the binary column rides the normal parquet path (vectorized reader,
column pruning skips payloads when untouched); feature extraction is the one
legitimately Python stage, so it is Arrow-batched and stateless.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, crc32 BIGINT, head_hex STRING, byte_mean DOUBLE"
)

try:  # optional heavy dependency — absent in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test/bench stand-in for a real media table: treat the UTF-8 bytes of
    ``text`` as the opaque payload, exactly as an image byte column would
    arrive from parquet."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real decode path — requires PIL, absent here by design."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; container ships without it — "
            "use extract_features() which falls back to byte-level features"
        )
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) when available")


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched featurizer: deterministic byte-level features.

    Stateless per batch → safe under speculative execution and retries.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "crc32": payloads.map(lambda b: zlib.crc32(bytes(b))).astype("int64"),
                "head_hex": payloads.map(lambda b: bytes(b)[:8].hex()),
                "byte_mean": payloads.map(
                    lambda b: float(sum(bytes(b))) / len(b) if len(b) else 0.0
                ),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload) rows."""
    return media.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def _feature_batches_arrow(batches):
    """Arrow-native featurizer: consumes/produces ``pyarrow.RecordBatch``
    directly — no Arrow→pandas→Arrow round-trip, no pandas object-dtype
    boxing of the binary payloads. Column math that pyarrow.compute can
    express (lengths) stays vectorized C++; the per-payload hashing is the
    honest Python part either way. Output is row-identical to
    ``_feature_batches`` (pinned in tests)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        payload = batch.column("payload")
        raw = [payload[i].as_py() for i in range(len(payload))]
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id").cast(pa.int64()),
                pc.binary_length(payload).cast(pa.int64()),
                pa.array([zlib.crc32(b) for b in raw], pa.int64()),
                pa.array([b[:8].hex() for b in raw], pa.string()),
                pa.array(
                    [float(sum(b)) / len(b) if len(b) else 0.0 for b in raw],
                    pa.float64(),
                ),
            ],
            names=["doc_id", "n_bytes", "crc32", "head_hex", "byte_mean"],
        )


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of ``extract_features``: same schema, same rows,
    one less serialization hop per batch — the preferred form when the
    featurizer does not need pandas semantics."""
    return media.select("doc_id", "payload").mapInArrow(
        _feature_batches_arrow, schema=FEATURE_SCHEMA
    )


def binary_duplicate_groups(
    media: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups over opaque BINARY payloads —
    ``dedup.exact_duplicate_groups``' keep-min policy applied to media
    bytes (round 12: the multimodal tier's full-oracle dedup row). No
    normalization: payloads are opaque, two images/audio clips are
    duplicates iff byte-identical, so the key is ``md5(payload)``
    computed scan-side and the one shuffle carries only (hash, id) —
    never the payloads. At 100 TB this is the embarrassingly-scalable
    shape: column pruning skips the payload bytes entirely when the
    hash is precomputed at ingest, and the group-by output is one row
    per distinct blob. (The reference's merge phase, src/main.cpp:
    104-142, unions per-word doc lists; this is the same
    key-group-reduce applied to content-hash keys.)"""
    return (
        media.select(
            F.col(id_col).alias("doc_id"),
            F.md5(F.col(payload_col)).alias("payload_md5"),
        )
        .groupBy("payload_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize path — requires PIL, absent in this container by design."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resize requires PIL; container ships without it — the "
            "Spark-side plumbing (mapInPandas over binary payloads) is "
            "identical to sample_frames(), which uses a deterministic fake"
        )
    raise NotImplementedError("wire PIL Image.resize((width, height)) when available")


FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_len BIGINT, frame_md5 STRING"


def sample_frames(
    media: DataFrame, frame_size: int = 256, stride: int = 4
) -> DataFrame:
    """Video-style frame sampling over opaque payloads: split each payload
    into fixed-size frames, keep every ``stride``-th, fingerprint each.

    The frame DECODE is the stubbed step (a real pipeline would demux with
    pyav/ffmpeg here); the Spark-side shape is the real thing — one
    ``mapInPandas`` pass, rows fan out per sampled frame, partitioning
    preserved, output schema typed. Deterministic, so it is oracle-checkable.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = max(1, -(-len(data) // frame_size)) if data else 0
                for i in range(0, n_frames, stride):
                    frame = data[i * frame_size : (i + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(batches, schema=FRAME_SCHEMA)
