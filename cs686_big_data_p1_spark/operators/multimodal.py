"""Multimodal media operators: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video next to text.
The Spark-native shape for that is exactly what this module implements:

  * payloads are opaque BinaryType columns co-resident with typed
    metadata columns (media_type, width/height, sample_rate, n_frames);
  * per-item decode / feature-extraction runs as Arrow-batched
    `mapInPandas` (one Python worker call per batch of rows, never
    per-row UDF dispatch);
  * frame sampling is a batch-shape-changing generator (one input row
    -> n output rows) — the mapInPandas iterator contract, not explode.

The container has no image/audio codecs, so the actual decode is a
STUB: `decode_image`/`decode_audio` raise NotImplementedError where
PIL/torchaudio would plug in, and the pipeline runs on
`fake_decode` — a deterministic byte-level interpretation — so the
Spark-side plumbing (schemas, Arrow batching, generator fan-out,
partitioning) is real and fully tested (tests/test_multimodal.py).

The media table itself is derived deterministically from the documents
fixture (md5-block payloads), so `media_metadata` is DuckDB-checkable:
the oracle recomputes the byte length and metadata from the same
formulas, which verifies the binary construction end-to-end.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

PAYLOAD_BLOCKS_MOD = 8  # payload = 16 bytes * (1 + doc_id % 8)
FRAME_BYTES = 16


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, media_type, payload binary, width, height,
    sample_rate, n_frames).

    The payload is a deterministic pseudo-random byte string:
    concatenated md5 blocks of (doc_id, block_no), 16-128 bytes. All
    construction is JVM built-ins (md5/unhex/aggregate) — binary
    columns never round-trip through Python here.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    blocks = F.lit(1) + (F.col("doc_id") % PAYLOAD_BLOCKS_MOD).cast("int")
    hex_payload = F.aggregate(
        F.sequence(F.lit(0), blocks - 1),
        F.lit(""),
        lambda acc, j: F.concat(
            acc, F.md5(F.format_string("media|%d|%d", F.col("doc_id"), j))
        ),
    )
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        "doc_id",
        mt.alias("media_type"),
        F.unhex(hex_payload).alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, (16 + (F.col("doc_id") % 16) * 4))
        .cast("int")
        .alias("width"),
        F.when(F.col("doc_id") % 3 == 0, (16 + (F.col("doc_id") % 12) * 4))
        .cast("int")
        .alias("height"),
        F.when(F.col("doc_id") % 3 == 1, (8000 + (F.col("doc_id") % 3) * 4000))
        .cast("int")
        .alias("sample_rate"),
        F.when(F.col("doc_id") % 3 == 2, (4 + F.col("doc_id") % 5))
        .cast("int")
        .alias("n_frames"),
    )


MEDIA_METADATA_ORACLE = f"""
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(16 * (1 + doc_id % {PAYLOAD_BLOCKS_MOD}) AS INTEGER) AS n_bytes,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id % 16) * 4 END AS INTEGER)
           AS width,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id % 12) * 4 END AS INTEGER)
           AS height,
       CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 3) * 4000 END
            AS INTEGER) AS sample_rate,
       CAST(CASE WHEN doc_id % 3 = 2 THEN 4 + doc_id % 5 END AS INTEGER)
           AS n_frames
FROM documents
"""


@query("media_metadata", oracle=MEDIA_METADATA_ORACLE)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over the media table. n_bytes is
    measured with length() on the actual binary column, so the oracle
    (which derives it from the construction formula) verifies the
    payload building end-to-end."""
    m = media_df(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("int").alias("n_bytes"),
        "width",
        "height",
        "sample_rate",
        "n_frames",
    )


# --- decode layer -----------------------------------------------------------


def decode_image(payload: bytes, width: int, height: int) -> "np.ndarray":
    """Real image decode goes here (PIL.Image.open -> np.asarray).
    Codec libraries are not available in this container."""
    raise NotImplementedError(
        "image codecs not installed; production wires PIL/pillow-simd here "
        "and keeps the same (payload, width, height) -> HxWxC array contract"
    )


def decode_audio(payload: bytes, sample_rate: int) -> "np.ndarray":
    """Real audio decode goes here (soundfile/torchaudio)."""
    raise NotImplementedError(
        "audio codecs not installed; production wires soundfile here and "
        "keeps the same (payload, sample_rate) -> float waveform contract"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for the codec layer: interpret the raw
    bytes as the decoded signal. Keeps every downstream shape
    (float array in, features out) identical to the real pipeline."""
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)


FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "mean_val double, rms double, feature array<float>"
)


def _features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: one call per batch, vectorized
    inside; emits a fixed 4-bucket byte-histogram 'embedding' per item."""
    for pdf in batches:
        sigs = [fake_decode(bytes(p)) for p in pdf["payload"]]
        hists = [
            (np.histogram(s, bins=4, range=(0, 256))[0] / s.size).astype(
                np.float32
            )
            for s in sigs
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [s.size for s in sigs],
                "mean_val": [float(s.mean()) for s in sigs],
                "rms": [float(math.sqrt((s**2).mean())) for s in sigs],
                "feature": hists,
            }
        )


@query("media_features")
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (the
    Pandas-UDF slow path, used only where built-ins genuinely cannot:
    byte-level signal math). Rows-only correctness check by design —
    the per-element pipeline is pinned instead by
    tests/test_multimodal.py against an independent Python recompute.

    Scale: work is per-row and embarrassingly parallel; Arrow moves
    each partition's payload column to Python once per batch; no
    shuffle anywhere in the plan."""
    return media_df(spark, sf_dir).mapInPandas(_features_batches, FEATURES_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling for video rows: one input row -> n_frames output
    rows, each a FRAME_BYTES slice of the payload — the batch-shape-
    changing mapInPandas generator a real video pipeline uses (decode,
    then emit every k-th frame)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame": []}
            vids = pdf[pdf["media_type"] == "video"]
            for doc_id, n_frames, payload in zip(
                vids["doc_id"], vids["n_frames"], vids["payload"]
            ):
                buf = bytes(payload)
                for i in range(int(n_frames)):
                    off = (i * FRAME_BYTES) % max(len(buf) - FRAME_BYTES + 1, 1)
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame"].append(buf[off : off + FRAME_BYTES])
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, "doc_id long, frame_no int, frame binary")


def payload_fingerprint(payload: bytes) -> str:
    """Reference md5 fingerprint used by the tests to cross-check
    payload bytes against an independent Python construction."""
    return hashlib.md5(payload).hexdigest()
