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

The codec layer is REAL for all three modalities, each an uncompressed
container a pure-numpy parser can handle: 24-bpp BMP (decode_image),
16-bit PCM WAV (decode_audio), and Cmono YUV4MPEG2/Y4M
(decode_video) — so `media_features` runs a genuine decode for every
row of media_encoded_df's real BMP/WAV/Y4M payloads. Compressed
formats (JPEG/PNG/FLAC/MP4) would wire PIL/soundfile/av into the same
(payload) -> array contract; those libraries are not in this
container. Schemas, Arrow batching, generator fan-out, and
partitioning are fully tested (tests/test_multimodal.py).

The media table itself is derived deterministically from the documents
fixture (md5-block payloads), so `media_metadata` is DuckDB-checkable:
the oracle recomputes the byte length and metadata from the same
formulas, which verifies the binary construction end-to-end.
"""

from __future__ import annotations

import hashlib
import math
import struct
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


# --- codec layer ------------------------------------------------------------
# Real, dependency-free codecs for the two uncompressed container
# formats parseable with numpy alone: 24-bpp BI_RGB Windows BMP and
# 16-bit PCM mono RIFF/WAVE. Compressed formats (JPEG/PNG/FLAC/MP4)
# would wire PIL/soundfile/av into the same (payload) -> array
# contract; those libraries are not in this container.


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bpp bottom-up BI_RGB BMP bytes (rows
    padded to 4-byte boundaries, channels stored BGR)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    bgr = pixels[:, :, ::-1]  # BMP stores BGR
    pad = b"\x00" * (stride - w * 3)
    for row in bgr[::-1]:  # bottom-up
        body += row.tobytes() + pad
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    return header + info + bytes(body)


def decode_image(payload: bytes) -> np.ndarray:
    """BMP decode: 24-bpp uncompressed bottom-up BI_RGB -> (H, W, 3)
    uint8 RGB array. Pure numpy — no codec libraries."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant bpp={bpp} comp={comp}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV decode: 16-bit PCM mono RIFF/WAVE -> (float64 waveform in
    [-1, 1), sample_rate). Walks the chunk list properly, so extra
    chunks (LIST/fact) before 'data' are handled."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, _ch, rate, _br, _ba, bps = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bps != 16:
                raise ValueError("unsupported WAV variant")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0, rate


def encode_y4m(frames: np.ndarray) -> bytes:
    """(T, H, W) uint8 luma frames -> YUV4MPEG2 (Y4M) bytes, Cmono
    colorspace (Y plane only) — the uncompressed streaming container
    mjpegtools/ffmpeg exchange raw video in. Pure byte concatenation:
    one ASCII stream header, then FRAME-delimited raw planes."""
    t, h, w = frames.shape
    assert frames.dtype == np.uint8
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode("ascii")
    return header + b"".join(b"FRAME\n" + f.tobytes() for f in frames)


def decode_video(payload: bytes) -> np.ndarray:
    """Y4M decode (Cmono): parse the stream header for W/H/colorspace,
    then split the FRAME-delimited Y planes -> (T, H, W) uint8. Pure
    numpy — no codec libraries (closes the r3 'video still fake_decode'
    gap the same way BMP/WAV did for image/audio)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("missing Y4M stream-header terminator")
    w = h = None
    colorspace = "420"  # Y4M default when the C tag is absent
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok[1:].decode("ascii")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "mono":
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")
    frame_len = w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed FRAME header")
        fnl = payload.find(b"\n", pos)  # FRAME may carry params; skip to \n
        if fnl < 0:
            raise ValueError("unterminated FRAME header")
        pos = fnl + 1
        plane = payload[pos : pos + frame_len]
        if len(plane) < frame_len:
            raise ValueError("truncated frame plane")
        frames.append(np.frombuffer(plane, np.uint8).reshape(h, w))
        pos += frame_len
    if not frames:
        return np.empty((0, h, w), np.uint8)
    return np.stack(frames)


def _pseudo_bytes(doc_id: int, n: int) -> bytes:
    """Deterministic content stream: concatenated md5 blocks of
    (doc_id, block_no) — the same generator media_df uses JVM-side, so
    tests can cross-check either construction independently."""
    out = b"".join(
        hashlib.md5(f"media|{doc_id}|{j}".encode()).digest()
        for j in range((n + 15) // 16)
    )
    return out[:n]


def _media_dims(doc_id: int) -> tuple[int, int, int, int]:
    """(width, height, sample_rate, n_samples) for the encoded table.
    Widths include non-multiples of 4 so BMP row padding is exercised."""
    return (
        5 + (doc_id % 6) * 3,
        4 + (doc_id % 5) * 2,
        8000 + (doc_id % 3) * 4000,
        64 + (doc_id % 8) * 32,
    )


MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)


def media_encoded_df(
    spark: SparkSession, sf_dir: str, media_type: str | None = None
) -> DataFrame:
    """documents -> media rows whose payloads are REAL encoded
    containers — 24-bpp BMP (image), PCM16 WAV (audio), Cmono Y4M
    (video) — over deterministic pseudo-random content, so downstream
    decode is genuine parsing for all three modalities.

    Encoding runs Arrow-batched in mapInPandas — in production payloads
    arrive already encoded and this builder is replaced by the ingest
    scan; every downstream operator is agnostic to which. media_type
    prunes to one modality BEFORE encoding (the builder's doc_id % 3
    keying, pushed to the scan) — single-modality consumers like
    media_phash_dedup skip 2/3 of the encode work."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    if media_type is not None:
        d = d.where(
            F.col("doc_id") % 3
            == ("image", "audio", "video").index(media_type)
        )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "media_type", "payload",
                "width", "height", "sample_rate", "n_frames",
            )}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h, rate, n_samp = _media_dims(doc_id)
                kind = ("image", "audio", "video")[doc_id % 3]
                width = height = sample_rate = n_frames = None
                if kind == "image":
                    px = np.frombuffer(
                        _pseudo_bytes(doc_id, w * h * 3), np.uint8
                    ).reshape(h, w, 3)
                    payload, width, height = encode_bmp(px), w, h
                elif kind == "audio":
                    samples = np.frombuffer(
                        _pseudo_bytes(doc_id, n_samp * 2), "<i2"
                    )
                    payload, sample_rate = encode_wav(samples, rate), rate
                else:
                    n_frames = 4 + doc_id % 5
                    frames = np.frombuffer(
                        _pseudo_bytes(doc_id, n_frames * h * w), np.uint8
                    ).reshape(n_frames, h, w)
                    payload, width, height = encode_y4m(frames), w, h
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(kind)
                rows["payload"].append(payload)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["sample_rate"].append(sample_rate)
                rows["n_frames"].append(n_frames)
            yield pd.DataFrame(rows)

    return d.mapInPandas(enc, MEDIA_SCHEMA)


FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "mean_val double, rms double, feature array<float>"
)


def decoded_signal(media_type: str, payload: bytes) -> tuple[np.ndarray, tuple]:
    """Route a payload through the right codec; returns (signal, the
    histogram range matching the signal's value domain)."""
    if media_type == "image":
        return decode_image(payload).astype(np.float64).ravel(), (0, 256)
    if media_type == "audio":
        return decode_audio(payload)[0], (-1, 1)
    return decode_video(payload).astype(np.float64).ravel(), (0, 256)


def _features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode + feature extraction: one call per batch;
    emits a fixed 4-bucket histogram 'embedding' over the DECODED
    signal (pixels for BMP, waveform for WAV, luma planes for Y4M).
    n_bytes stays the encoded payload size (the storage cost)."""
    for pdf in batches:
        n_bytes, means, rmss, hists = [], [], [], []
        for mt, p in zip(pdf["media_type"], pdf["payload"]):
            buf = bytes(p)
            s, rng = decoded_signal(mt, buf)
            n_bytes.append(len(buf))
            means.append(float(s.mean()))
            rmss.append(float(math.sqrt((s**2).mean())))
            hists.append(
                (np.histogram(s, bins=4, range=rng)[0] / s.size).astype(
                    np.float32
                )
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes,
                "mean_val": means,
                "rms": rmss,
                "feature": hists,
            }
        )


@query("media_features")
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature extraction over encoded binary payloads via
    mapInPandas (the Pandas-UDF slow path, used only where built-ins
    genuinely cannot: container parsing and signal math). Every row
    runs a real decoder — BMP for image, WAV for audio, Y4M for video.
    Rows-only correctness check by design — the per-element pipeline is
    pinned by tests/test_multimodal.py against an independent Python
    recompute of all three codecs.

    Scale: work is per-row and embarrassingly parallel; Arrow moves
    each partition's payload column to Python once per batch; no
    shuffle anywhere in the plan."""
    return media_encoded_df(spark, sf_dir).mapInPandas(
        _features_batches, FEATURES_SCHEMA
    )


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


def sample_decoded_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Real frame sampling over ENCODED video rows: decode the Y4M
    container and emit every k-th luma plane as its own row — the
    decode-then-subsample shape a production video pipeline uses
    (sample_frames above is the container-agnostic byte-slice variant
    over the metadata table). One input row -> ceil(T/k) output rows
    via the batch-shape-changing mapInPandas generator; no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_no": [], "height": [], "width": [],
                "frame": [],
            }
            vids = pdf[pdf["media_type"] == "video"]
            for doc_id, payload in zip(vids["doc_id"], vids["payload"]):
                frames = decode_video(bytes(payload))
                for i in range(0, frames.shape[0], every_k):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["height"].append(frames.shape[1])
                    out["width"].append(frames.shape[2])
                    out["frame"].append(frames[i].tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(
        gen, "doc_id long, frame_no int, height int, width int, frame binary"
    )


# --- perceptual image dedup -------------------------------------------------
# dHash (difference hash): downsample the grayscale image to an
# 8x9 grid and emit one bit per horizontally-adjacent pair
# (left < right). Brightness shifts, re-encodes, and mild scaling
# change every payload byte (so exact/doc_fingerprint dedup misses
# them) but preserve the gradient-sign structure dHash keys on.

PHASH_GRID = 8  # 8x8 bits from an (8, 9) grayscale downsample


def _block_stats(a: np.ndarray, th: int, tw: int):
    """Deterministic area downsample of a 2-D integer array to a
    (th, tw) grid of EXACT (block_sum, block_count) int64 pairs
    (integer boundaries, so no interpolation-library dependence;
    upscaling degenerates to pixel repetition via the >=1 clamp).
    Kept in integers so dHash bit decisions never touch floats."""
    h, w = a.shape
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    sums = np.empty((th, tw), np.int64)
    counts = np.empty((th, tw), np.int64)
    for i in range(th):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(tw):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            block = a[y0:y1, x0:x1]
            sums[i, j] = int(block.sum())
            counts[i, j] = block.size
    return sums, counts


def dhash64(img: np.ndarray) -> int:
    """(H, W, 3) uint8 RGB -> 64-bit difference hash.

    All-integer pipeline: grayscale as the channel SUM (3x the mean —
    scale-free for comparisons), exact block sums/counts on the
    8x9 grid, and the left<right bit decided by cross-multiplication
    (sum_r * n_l > sum_l * n_r) instead of float mean comparison. A
    float version is ALMOST shift-invariant but hypothesis found the
    rounding tie: a sub-epsilon adjacent-cell difference can collapse
    when +c re-rounds both means. With exact integers, any uniform
    +c shift without clipping changes sums by 3*c*count per block and
    cancels from the cross-multiplied comparison — invariance is a
    theorem, not a tendency (property-tested)."""
    gray = img.astype(np.int64).sum(axis=2)
    sums, counts = _block_stats(gray, PHASH_GRID, PHASH_GRID + 1)
    bits = (
        sums[:, 1:] * counts[:, :-1] > sums[:, :-1] * counts[:, 1:]
    ).ravel()
    return int(np.packbits(bits).tobytes().hex(), 16)


def image_dhash(media: DataFrame) -> DataFrame:
    """Image rows -> (doc_id, dhash hex string) via Arrow-batched
    mapInPandas: decode_image + dhash64 per row, one Python call per
    batch. Non-image rows are dropped map-side, so only 16-byte hex
    digests ever reach a shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["media_type"] == "image"]
            ids, hashes = [], []
            for doc_id, payload in zip(imgs["doc_id"], imgs["payload"]):
                ids.append(doc_id)
                hashes.append(
                    format(dhash64(decode_image(bytes(payload))), "016x")
                )
            yield pd.DataFrame({"doc_id": ids, "dhash": hashes})

    return media.mapInPandas(gen, "doc_id long, dhash string")


def phash_dedup(media: DataFrame) -> DataFrame:
    """dHash groupBy dedup over image rows — dedup_exact's digest
    shape, keyed on the perceptual hash instead of md5(payload), so
    re-encoded / brightness-shifted copies of the same picture collapse
    into one class (keeper = min doc_id, deterministic)."""
    return (
        image_dhash(media)
        .groupBy("dhash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query("media_phash_dedup")
def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over the encoded media table (E-family
    extension): decode -> dHash -> digest groupBy. Rows-only by design
    (the decode+hash is not SQL-expressible); the pytest plants a
    brightness-shifted BMP duplicate pair that exact fingerprinting
    misses and dHash catches.

    Scale: decode+hash is map-side and embarrassingly parallel; the
    one shuffle carries (16-hex-char, long) rows — dedup_exact's
    digest-only shuffle shape, never pixels."""
    return phash_dedup(media_encoded_df(spark, sf_dir, media_type="image"))


def payload_fingerprint(payload: bytes) -> str:
    """Reference md5 fingerprint used by the tests to cross-check
    payload bytes against an independent Python construction."""
    return hashlib.md5(payload).hexdigest()


# --- Perceptual AUDIO dedup (the image dHash's acoustic sibling) -----

AFP_SEGMENTS = 17  # time segments (17 -> 16 gradient comparisons)
AFP_BANDS = 4  # coarse frequency bands per segment


def audio_fphash64(payload: bytes) -> int:
    """64-bit acoustic fingerprint: decode WAV, split the waveform
    into {AFP_SEGMENTS} equal time segments, measure energy in
    {AFP_BANDS} coarse rFFT bands per segment, and emit the TIME-
    GRADIENT SIGN per band — bit (s, b) = E[s][b] > E[s+1][b], a
    16x4 = 64-bit code (the chromaprint/Haitsma-Kalker shape, pure
    numpy). Comparisons are invariant under any positive gain, so
    volume-shifted/re-mastered copies of the same audio collapse to
    one fingerprint while md5(payload) differs."""
    wave, _rate = decode_audio(payload)
    n = len(wave) // AFP_SEGMENTS
    if n == 0:
        return 0
    segs = wave[: n * AFP_SEGMENTS].reshape(AFP_SEGMENTS, n)
    spec = np.abs(np.fft.rfft(segs, axis=1)) ** 2
    nb = spec.shape[1] // AFP_BANDS
    if nb == 0:
        return 0
    bands = (
        spec[:, : nb * AFP_BANDS]
        .reshape(AFP_SEGMENTS, AFP_BANDS, nb)
        .sum(axis=2)
    )
    bits = (bands[:-1] > bands[1:]).flatten()  # 16 x 4 bools
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out


def audio_fphash_df(media: DataFrame) -> DataFrame:
    """Audio rows -> (doc_id, afp hex) via Arrow-batched mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(doc_id)
                hashes.append(
                    format(audio_fphash64(bytes(payload)), "016x")
                )
            yield pd.DataFrame({"doc_id": ids, "afp": hashes})

    return media.mapInPandas(gen, "doc_id long, afp string")


@query("media_audio_dedup")
def media_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual AUDIO dedup: WAV decode -> 64-bit band-energy
    gradient fingerprint -> digest groupBy (keeper = min doc_id) —
    completes the perceptual family media_phash_dedup opened for
    images: gain-shifted or re-mastered copies of the same recording
    collapse where exact payload hashing sees distinct bytes.
    Rows-only by design (FFT decode is not SQL); the pytest plants a
    half-amplitude duplicate pair (power-of-2 scaling is exact in
    IEEE floats, so the fingerprint equality is deterministic, not
    approximate).

    Scale: decode+FFT is map-side Arrow work, embarrassingly
    parallel; the one shuffle carries (16-hex, long) rows — the
    digest-only shape every dedup in this engine shuffles."""
    return (
        audio_fphash_df(media_encoded_df(spark, sf_dir, media_type="audio"))
        .groupBy("afp")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def video_phash64(payload: bytes) -> int:
    """64-bit video fingerprint: decode Y4M, take the TEMPORALLY
    MIDDLE frame (stable under head/tail trims of up to one frame on
    this fixture's short clips), dHash it — brightness-invariant by
    dhash64's integer gradient comparison. A production variant hashes
    several sampled frames and matches on any-band agreement
    (sample_frames provides the sampling); one frame keeps the
    fixture-scale cost honest while exercising the full decode."""
    frames = decode_video(payload)
    mid = frames[len(frames) // 2]
    # dhash64 takes (H, W, 3); lift the Y4M luma plane to 3 identical
    # channels (the channel-sum grayscale is then exactly 3x luma —
    # scale-free for dHash's cross-multiplied comparisons)
    return dhash64(np.repeat(mid[:, :, None], 3, axis=2))


@query("media_video_dedup")
def media_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual VIDEO dedup: Y4M decode -> middle-frame dHash ->
    digest groupBy (keeper = min doc_id) — completes the perceptual
    family across all three modalities (image media_phash_dedup,
    audio media_audio_dedup). Rows-only by design; the pytest plants
    a brightness-shifted re-encode that exact payload hashing misses.

    Scale: decode+hash map-side Arrow work; the one shuffle carries
    16-hex digests (the engine's universal dedup shape)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(doc_id)
                hashes.append(format(video_phash64(bytes(payload)), "016x"))
            yield pd.DataFrame({"doc_id": ids, "vhash": hashes})

    return (
        media_encoded_df(spark, sf_dir, media_type="video")
        .mapInPandas(gen, "doc_id long, vhash string")
        .groupBy("vhash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
