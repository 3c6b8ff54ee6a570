"""Physical chunk IO: the write/read/reassemble path (SURVEY.md §2.A S1/S3/S4).

The reference stores each chunk as a loose file `<name>-chunk<N>` plus a
`.md5` sidecar (storageNode/MessageProcessor.java:193-211) and
reassembles by sorted concatenation with contiguity checks
(structures/Chunk.java:78-126). Spark-first recast:

  * a chunk is a row `(filename, sequence_no, size, checksum, data)`
    with the payload as a BinaryType column and the checksum co-resident
    (no sidecar files — the metadata travels with the data);
  * the sink is partitioned parquet (`partitionBy(filename)`), so one
    DFS file = one parquet partition directory and per-file reads are
    partition-pruned scans;
  * recovery/verification is a DataFrame filter (`md5(data) != checksum`),
    not a directory walk;
  * reassembly is `orderBy(sequence_no)` + a single consumer-side
    iterator — the one sanctioned driver-side materialization
    (SURVEY.md §4.3), mirroring the reference's client-side assembly.

At 100 TB the same pipeline holds: ingest via
`spark.read.format("binaryFile")` with `maxPartitionBytes` sharding,
write with `partitionBy`, verify distributed; only the final
single-file concatenation is inherently one consumer's work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..views import CHUNK_SIZE

CHUNK_SCHEMA = (
    "filename string, sequence_no int, size bigint, checksum string, data binary"
)


def chunk_bytes(
    spark: SparkSession,
    data: bytes,
    filename: str,
    chunk_size: int = CHUNK_SIZE,
) -> DataFrame:
    """S1: split a byte payload into fixed-size chunks + short tail
    (structures/Chunk.java:36-76, sizing :195-214, non-empty guard
    :144-150). Splitting happens where the bytes live (the client is a
    single process in the reference too); checksums are computed
    distributed, by the engine's own md5 (Utils.java:24-58)."""
    if len(data) == 0:
        raise ValueError("cannot chunk an empty payload (Chunk.java:144-150)")
    pieces = [
        (filename, i, data[off : off + chunk_size])
        for i, off in enumerate(range(0, len(data), chunk_size))
    ]
    df = spark.createDataFrame(
        pieces, "filename string, sequence_no int, data binary"
    )
    return df.select(
        "filename",
        "sequence_no",
        F.length("data").cast("bigint").alias("size"),
        F.md5("data").alias("checksum"),
        "data",
    )


def ingest_binary_files(
    spark: SparkSession,
    dir_path: str,
    chunk_size: int = CHUNK_SIZE,
    pattern: str = "*",
) -> DataFrame:
    """S1 distributed ingest: many local/remote files -> chunk rows via
    `spark.read.format("binaryFile")` (SURVEY.md §2.A S1's scale path;
    chunk_bytes covers the reference's single-process client split,
    structures/Chunk.java:36-76).

    All chunking is JVM-side built-ins — explode over the chunk-count
    sequence, binary substring for the slice, md5 for the checksum — so
    ingest scales with the file listing (one task per file; Spark caps
    binaryFile payloads at 2 GB/file, the same regime the reference's
    int sequence numbers assume). Empty files are dropped, mirroring
    the non-empty guard (Chunk.java:144-150)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(dir_path)
    )
    n_chunks = F.ceil(F.col("length") / F.lit(float(chunk_size))).cast("int")
    exploded = (
        raw.where(F.col("length") > 0)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("filename"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("sequence_no"),
            "content",
        )
    )
    data = F.expr(
        f"substring(content, sequence_no * {chunk_size}L + 1, {chunk_size})"
    )
    return exploded.select(
        "filename",
        "sequence_no",
        data.alias("data"),
    ).select(
        "filename",
        "sequence_no",
        F.length("data").cast("bigint").alias("size"),
        F.md5("data").alias("checksum"),
        "data",
    )


def write_chunks(df: DataFrame, path: str) -> None:
    """S3 sink: chunk rows -> parquet partitioned by filename
    (storageNode/MessageProcessor.java:193-211; the `.md5` sidecar
    becomes the co-resident checksum column). zstd instead of the
    snappy default: the payload column dominates the bytes at 100 TB
    and zstd's ratio is worth the small encode cost on a write-once
    store."""
    df.write.mode("append").option("compression", "zstd").partitionBy(
        "filename"
    ).parquet(path)


def read_chunks(spark: SparkSession, path: str) -> DataFrame:
    """S2 recovery scan over the store: read every chunk back with its
    recorded checksum (storageNode/StorageNode.java:61-99 readChunks —
    no name-regex parse needed, the schema carries the identity)."""
    return spark.read.parquet(path).select(
        "filename", "sequence_no", "size", "checksum", "data"
    )


def verify_chunks(df: DataFrame) -> DataFrame:
    """P2/P3 predicate: rows whose payload no longer matches the
    recorded checksum (Utils.java:66-71, Chunk.java:156-164)."""
    return df.where(F.md5("data") != F.col("checksum"))


def reassemble(spark: SparkSession, path: str, filename: str) -> bytes:
    """S4: merge one file's chunks back into its byte sequence
    (structures/Chunk.java:78-126 createFileFromChunks).

    Validations mirror the reference: chunk 0 present and sequence
    contiguous (:79-90), checksums intact before use (Client.java:333).
    The partition filter prunes the scan to the one file; ordering and
    concatenation are the consumer-side step.
    """
    chunks = read_chunks(spark, path).where(F.col("filename") == filename)
    stats = chunks.agg(
        F.min("sequence_no").alias("lo"),
        F.max("sequence_no").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("sequence_no").alias("n_distinct"),
    ).first()
    if stats.n == 0:
        raise ValueError(f"no chunks for {filename}")
    if stats.lo != 0 or stats.n_distinct != stats.hi + 1:
        raise ValueError(
            f"non-contiguous chunk set for {filename}: "
            f"min={stats.lo} max={stats.hi} distinct={stats.n_distinct} "
            "(Chunk.java:79-90)"
        )
    if not verify_chunks(chunks).isEmpty():
        raise ValueError(f"checksum mismatch in {filename} (Client.java:333)")
    ordered = (
        chunks.select("sequence_no", "data")
        .dropDuplicates(["sequence_no"])
        .orderBy("sequence_no")
    )
    return b"".join(bytes(r.data) for r in ordered.toLocalIterator())
