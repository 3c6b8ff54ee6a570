"""Source/sink format breadth: CSV, JSON(L), and partitioned parquet.

The reference ingests local binary files and socket protobuf
(SURVEY.md §2.A); the engine's native storage is parquet. Real
pipelines also ingest delimited text and JSONL drops, so this module
pins those paths with the same rules as tables.py:

  * every read takes an explicit schema — no inference pass, so a CSV
    read is one scan at any scale and types can't drift per-file;
  * timestamps round-trip through an explicit ISO-8601 format;
  * writes are directory sinks (one part-file per partition), the only
    layout that scales writers horizontally.

CSV/JSON carry no column statistics or row-group pruning, so they are
ingest formats here: read once, write parquet, query that — the tests
assert lossless round-trips both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

_CSV_OPTIONS = {
    "header": "true",
    "timestampFormat": TS_FORMAT,
    "nullValue": "\\N",  # distinguish NULL from empty string
    "escape": '"',
}

_JSON_OPTIONS = {
    "timestampFormat": TS_FORMAT,
}


def write_csv(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Directory CSV sink. n_files coalesces small outputs; leave None
    at scale so each task writes its own part-file."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").options(**_CSV_OPTIONS).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).options(**_CSV_OPTIONS).csv(path)


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Directory JSONL sink (one JSON object per line — the interchange
    format of web-crawl / training-data drops)."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").options(**_JSON_OPTIONS).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    return spark.read.schema(schema).options(**_JSON_OPTIONS).json(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Partitioned parquet sink: the engine's canonical layout. Reads
    filtered on partition_cols become partition-pruned scans."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def jsonl_ingest_to_parquet(
    spark: SparkSession,
    jsonl_path: str,
    parquet_path: str,
    schema: T.StructType,
) -> DataFrame:
    """The canonical ingest hop: JSONL drop -> typed parquet. Returns
    the re-read parquet frame (what downstream queries should use)."""
    read_jsonl(spark, jsonl_path, schema).write.mode("overwrite").parquet(
        parquet_path
    )
    return spark.read.schema(schema).parquet(parquet_path)


def write_orc(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Directory ORC sink (zlib default). ORC is the second columnar
    format Spark ships natively; unlike CSV/JSONL it carries stripe
    statistics, so predicate pushdown works on it like parquet —
    included so a reference user with ORC-resident data can land
    directly instead of transcoding first."""
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).orc(path)


def upsert_parquet_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str,
) -> None:
    """Keyed upsert into a partition_col-partitioned parquet store
    without a table format: rows in `updates` replace base rows with
    the same key; untouched PARTITIONS are never read or rewritten.
    This is the MERGE-INTO shape (the reference's publishChunk
    set-semantics upsert, FileTable.java:107-122, at file-store
    granularity) on plain parquet:

      1. dynamic partition overwrite (partitionOverwriteMode=dynamic)
         scopes the write to partitions present in the merged frame;
      2. the base side is partition-pruned to exactly those
         partitions before the anti-join, so IO is
         O(affected partitions), not O(store);
      3. the merged frame is localCheckpoint'ed eagerly BEFORE the
         overwrite — Spark cannot lazily read from the files it is
         replacing, and the checkpoint bounds at the affected
         partitions' size.

    Idempotent by construction: re-running the same updates rewrites
    the same partitions to the same contents. At 100 TB the
    partition column is a date/bucket key and an upsert touches the
    handful of partitions the updates span."""
    # dynamic mode is requested per-WRITE (option below), never set
    # session-wide: a leaked session conf would silently weaken every
    # later mode("overwrite") in the process to partition-scoped
    # (ADVICE r13 — the IVF store's rebuild-repairs invariant).
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    from pyspark.sql import functions as F

    try:
        base = spark.read.parquet(path).where(
            F.col(partition_col).isin(parts)
        )
        survivors = base.join(updates, keys, "left_anti")
        merged = survivors.unionByName(updates)
    except Exception:  # first write: no base store yet
        merged = updates
    merged = merged.localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) output files and return that
    count. The lakehouse maintenance task every long-lived table
    needs — streaming sinks and fine-grained upserts accrete
    thousands of KB-sized part-files whose per-file open/footer/task
    overhead eventually dominates scan time.

    Sizing reads ONLY file metadata (Hadoop FS listing — no data
    pass); the single data pass is a round-robin repartition to the
    computed width, which both merges small files and splits
    oversized ones. Round-robin (not range/hash) because compaction
    must not assume a clustering key — callers who need co-location
    use zorder_write / write_bucketed instead. At 100 TB the listing
    is driver-side O(#files) names (the same cost any planner pays)
    and the rewrite parallelizes across executors; compaction of a
    partitioned table should be run per-partition so only hot
    partitions pay the rewrite.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = path.getFileSystem(conf)
    total = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet") and not name.startswith("_"):
            total += f.getLen()
    n_out = max(1, -(-total // target_bytes))
    df = spark.read.parquet(in_path)
    df.repartition(n_out).write.mode("overwrite").parquet(out_path)
    return n_out
