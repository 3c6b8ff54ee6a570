"""Versioned snapshot tables (time travel) on plain parquet.

The reference's publish step replaces a file's chunk list atomically
under a lock (controller/FileTable.java's synchronized publish);
lakehouse formats generalize that to versioned table snapshots. This
module provides the same contract with nothing but parquet and one
atomic filesystem rename per commit — no table-format dependency:

  * every commit writes a full snapshot under ``<table>/v=NNNNNNNN/``,
    staged in a hidden temp dir and RENAMED into place (rename is the
    atomic primitive on HDFS-compatible stores and POSIX alike), so a
    reader can never observe a half-written version;
  * the current version is simply the highest published directory —
    no manifest file to corrupt, no read-modify-write race: two racing
    writers target different version numbers and the loser's rename
    fails (directory exists), exactly like a CAS;
  * readers pin a version (time travel) or take the latest; a reader
    holding version N is unaffected by later commits or by vacuum of
    OTHER versions (immutable snapshot isolation).

Scale: a commit's cost is the snapshot write itself (parallel across
executors); version discovery is one driver-side directory listing of
O(#versions) names — the same metadata cost any table format pays.
For mostly-unchanged data, pair with ``upsert_parquet_partitioned``
(partition-scoped rewrites) and snapshot the partition directories
instead; this module keeps whole-table semantics deliberately simple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_WIDTH = 8  # zero-padded version directory suffix


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), p, jvm


def snapshot_versions(spark: SparkSession, table_path: str) -> list[int]:
    """Published versions, ascending. Hidden staging dirs are invisible
    (dot-prefixed names are filtered, and Spark ignores them anyway)."""
    fs, p, _ = _fs(spark, table_path)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def write_snapshot(spark: SparkSession, df: DataFrame, table_path: str) -> int:
    """Commit df as the next version; return its number. Stage-then-
    rename makes the publish atomic: concurrent committers race on the
    rename and the loser retries with the next number."""
    fs, _, jvm = _fs(spark, table_path)
    while True:
        vs = snapshot_versions(spark, table_path)
        v = (vs[-1] if vs else 0) + 1
        stage = f"{table_path}/.stage-v{v:0{_WIDTH}d}"
        final = f"{table_path}/v={v:0{_WIDTH}d}"
        df.write.mode("overwrite").parquet(stage)
        if fs.rename(
            jvm.org.apache.hadoop.fs.Path(stage),
            jvm.org.apache.hadoop.fs.Path(final),
        ):
            return v
        fs.delete(jvm.org.apache.hadoop.fs.Path(stage), True)  # lost the race


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """The table as of `version` (latest when None)."""
    vs = snapshot_versions(spark, table_path)
    if not vs:
        raise FileNotFoundError(f"no published versions under {table_path}")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise FileNotFoundError(f"version {version} not in {vs}")
    return spark.read.parquet(f"{table_path}/v={version:0{_WIDTH}d}")


def vacuum_snapshots(
    spark: SparkSession, table_path: str, keep_last: int
) -> list[int]:
    """Drop all but the newest keep_last versions; return what was
    removed. Readers pinned to a surviving version are unaffected
    (snapshots are immutable); keep_last >= 1 always holds the
    latest."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs, _, jvm = _fs(spark, table_path)
    vs = snapshot_versions(spark, table_path)
    drop = vs[:-keep_last]
    for v in drop:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{table_path}/v={v:0{_WIDTH}d}"),
            True,
        )
    return drop
