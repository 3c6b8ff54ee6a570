"""Physical write/read/reassemble round-trip (SURVEY.md §5.2 item 2 —
the ChunkTest.java:37-100 split/reassemble cases against real IO)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cs686_big_data_p1_spark.sources.chunk_io import (
    chunk_bytes,
    read_chunks,
    reassemble,
    verify_chunks,
    write_chunks,
)

CHUNK = 1000


def _payload(n: int, seed: int = 686) -> bytes:
    return bytes(random.Random(seed).getrandbits(8) for _ in range(n))


def test_round_trip_multi_file(spark, tmp_path):
    store = str(tmp_path / "chunks")
    payloads = {
        "a.dat": _payload(2500, 1),  # short tail
        "b.dat": _payload(CHUNK, 2),  # exactly one chunk
        "c.dat": _payload(3 * CHUNK, 3),  # exact multiple
    }
    for name, data in payloads.items():
        write_chunks(chunk_bytes(spark, data, name, CHUNK), store)

    back = read_chunks(spark, store)
    assert back.count() == 3 + 1 + 3
    # checksums survive the round trip
    assert verify_chunks(back).isEmpty()
    # partitioned layout: per-file read prunes to that file's chunks
    for name, data in payloads.items():
        assert reassemble(spark, store, name) == data


def test_chunk_sizing_matches_reference_table(spark):
    # ChunkTest.java:17-34 count/last-size table cases
    df = chunk_bytes(spark, _payload(2500), "t.dat", CHUNK)
    rows = {r.sequence_no: r.size for r in df.collect()}
    assert rows == {0: 1000, 1: 1000, 2: 500}
    with pytest.raises(ValueError):
        chunk_bytes(spark, b"", "empty.dat", CHUNK)


def test_reassemble_rejects_gaps_and_corruption(spark, tmp_path):
    store = str(tmp_path / "chunks")
    data = _payload(2500, 7)
    df = chunk_bytes(spark, data, "g.dat", CHUNK)
    write_chunks(df.where(F.col("sequence_no") != 1), store)
    with pytest.raises(ValueError, match="non-contiguous"):
        reassemble(spark, store, "g.dat")

    store2 = str(tmp_path / "chunks2")
    corrupted = df.withColumn(
        "data",
        F.when(F.col("sequence_no") == 1, F.lit(b"\x00" * CHUNK)).otherwise(
            F.col("data")
        ),
    )
    write_chunks(corrupted, store2)
    with pytest.raises(ValueError, match="checksum"):
        reassemble(spark, store2, "g.dat")


def test_binaryfile_ingest_matches_client_split(spark, tmp_path):
    """S1 distributed path: binaryFile ingest must produce byte-for-byte
    the same chunk rows as the single-process client split, and the
    store round-trips through write_chunks/reassemble
    (structures/Chunk.java:36-76 semantics at the many-files scale)."""
    from cs686_big_data_p1_spark.sources.chunk_io import ingest_binary_files

    src = tmp_path / "incoming"
    src.mkdir()
    payloads = {
        "a.dat": _payload(2500, 11),  # short tail
        "b.dat": _payload(CHUNK, 12),  # exactly one chunk
        "c.dat": _payload(3 * CHUNK, 13),  # exact multiple
    }
    for name, data in payloads.items():
        (src / name).write_bytes(data)
    (src / "empty.dat").write_bytes(b"")  # must be dropped

    ingested = ingest_binary_files(spark, str(src), CHUNK)
    got = {
        (r.filename, r.sequence_no): (r.size, r.checksum, bytes(r.data))
        for r in ingested.collect()
    }
    want = {}
    for name, data in payloads.items():
        for r in chunk_bytes(spark, data, name, CHUNK).collect():
            want[(r.filename, r.sequence_no)] = (
                r.size,
                r.checksum,
                bytes(r.data),
            )
    assert got == want

    store = str(tmp_path / "store")
    write_chunks(ingested, store)
    for name, data in payloads.items():
        assert reassemble(spark, store, name) == data
