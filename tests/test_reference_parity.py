"""Ports of the reference's own unit tests (SURVEY.md §5.1).

ChunkTest.java:17-34  -> chunk-count / last-chunk-size tables
UtilsTest.java:28-40  -> MD5 golden value
ChunkTest.java:37-100 -> split/reassemble round-trip
UtilsTest.java:15-26  -> random-N size/membership properties
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ChunkTest.java:17-24
CHUNK_COUNT_CASES = [(100, 100, 1), (100, 99, 2), (100, 50, 2), (100, 49, 3), (100, 101, 1)]
# ChunkTest.java:27-34 — (total, chunk) -> last chunk size
LAST_SIZE_CASES = [(100, 100, 100), (100, 99, 1), (100, 50, 50), (100, 49, 2), (100, 101, 100)]


def test_chunk_count_table(spark):
    rows = [(t, c) for t, c, _ in CHUNK_COUNT_CASES]
    df = spark.createDataFrame(rows, "total bigint, chunk bigint").select(
        F.ceil(F.col("total") / F.col("chunk").cast("double")).cast("int").alias("n")
    )
    got = [r.n for r in df.collect()]
    assert got == [n for _, _, n in CHUNK_COUNT_CASES]


def test_last_chunk_size_table(spark):
    rows = [(t, c) for t, c, _ in LAST_SIZE_CASES]
    df = spark.createDataFrame(rows, "total bigint, chunk bigint")
    n = F.ceil(F.col("total") / F.col("chunk").cast("double")).cast("bigint")
    df = df.select((F.col("total") - (n - 1) * F.col("chunk")).alias("last"))
    got = [r.last for r in df.collect()]
    assert got == [last for _, _, last in LAST_SIZE_CASES]


def test_md5_golden_value(spark):
    # UtilsTest.java:28-40: md5("I like ice cream.\n")
    df = spark.createDataFrame([("I like ice cream.\n",)], "s string").select(
        F.md5(F.col("s").cast("binary")).alias("h")
    )
    assert df.collect()[0].h == "bbc3b8f636bbcf0b994f0698d25ca85c"


def test_split_reassemble_roundtrip(spark):
    # ChunkTest.java:37-67 analog: split a byte string into 8-byte chunks
    # via the engine's chunk-plan math, reassemble by sequence order,
    # assert content equality.
    data = b"Hello, my name is R2-D2.\n"
    chunk_size = 8
    n = math.ceil(len(data) / chunk_size)
    rows = [
        (i, bytes(data[i * chunk_size : (i + 1) * chunk_size]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "sequence_no int, payload binary")
    # contiguity checks mirrored from Chunk.java:79-98
    agg = df.agg(
        F.min("sequence_no").alias("mn"),
        F.max("sequence_no").alias("mx"),
        F.count(F.lit(1)).alias("cnt"),
    ).collect()[0]
    assert agg.mn == 0 and agg.cnt == agg.mx + 1
    out = b"".join(
        bytes(r.payload)
        for r in df.orderBy("sequence_no").collect()
    )
    assert out == data


def test_placement_pick_properties(spark, registry):
    # UtilsTest.java:15-26 analog: picks per chunk are (a) at most
    # n_missing, (b) a subset of the candidate set (online non-holders).
    sf = "/root/testdata/sf0.001"
    picks = registry.QUERIES["placement_pick"](spark, sf).toPandas()
    under = registry.QUERIES["under_replicated"](spark, sf).toPandas()
    cand = registry.QUERIES["placement_candidates"](spark, sf).toPandas()
    missing = under.set_index(["filename", "sequence_no"])["n_missing"]
    got = picks.groupby(["filename", "sequence_no"]).size()
    for key, n_picked in got.items():
        assert n_picked <= missing.loc[key]
    cand_set = set(map(tuple, cand.values))
    assert set(map(tuple, picks.values)) <= cand_set
