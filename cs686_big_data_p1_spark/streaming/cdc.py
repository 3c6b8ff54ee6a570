"""Streaming CDC APPLY: the write-side twin of snapshot_diff.

sources/snapshots.py gives the READ side of change-data-capture —
`snapshot_diff(v_old, v_new)` emits one row per changed key with
`change_type` in {inserted, deleted, updated} and old_/new_ values
side by side. This module closes the loop (VERDICT r8 #9): a stream
of such diff rows is MERGED into a downstream snapshot table, one
verified-CAS snapshot commit per micro-batch, so replaying a source
table's diffs reconstructs it version-for-version on the replica —
the parquet-native form of `MERGE INTO` fed by `table_changes()`.

Contract: each micro-batch carries the diff of ONE version transition
(the natural replay unit — one snapshot_diff output per file/batch),
in commit order. Within a batch each key appears at most once, which
snapshot_diff guarantees by construction.

Merge semantics per batch, all null-safe on the key (NULL is a legal
key value — the snapshot_diff rationale):
  * deleted   -> the key's current row is removed;
  * updated   -> the key's current row is replaced by the new_* values;
  * inserted  -> the new_* values are added.

Scale: one anti-join of the replica against the (changed-keys-sized,
broadcastable) batch plus a union — the standard copy-on-write MERGE
shape; the per-batch snapshot commit is the same verified-CAS publish
every writer uses, so a crashed apply never leaves a half-merged
version (the replica simply resumes at its last published version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.snapshots import read_snapshot, write_snapshot


def apply_diff_batch(
    spark: SparkSession,
    diff: DataFrame,
    table_path: str,
    key_cols: list[str],
) -> int:
    """Merge one snapshot_diff-shaped batch into the snapshot table at
    table_path; returns the published version. Value columns are
    recovered from the diff's new_* columns (snapshot_diff's naming
    contract)."""
    val_cols = [c[len("new_"):] for c in diff.columns if c.startswith("new_")]
    try:
        cur = read_snapshot(spark, table_path)
    except FileNotFoundError:
        cur = spark.createDataFrame(
            [], diff.select(*key_cols, *[f"new_{c}" for c in val_cols])
            .toDF(*key_cols, *val_cols).schema
        )
    changed = diff.select(
        *[F.col(k).alias(f"_ck_{k}") for k in key_cols]
    ).distinct()
    cond = None
    for k in key_cols:
        eq = F.col(k).eqNullSafe(F.col(f"_ck_{k}"))
        cond = eq if cond is None else cond & eq
    survivors = cur.join(F.broadcast(changed), cond, "left_anti")
    upserts = (
        diff.where(F.col("change_type") != "deleted")
        .select(*key_cols, *[F.col(f"new_{c}").alias(c) for c in val_cols])
    )
    return write_snapshot(
        spark, survivors.unionByName(upserts), table_path
    )


def cdc_apply_stream(
    diffs: DataFrame, table_path: str, key_cols: list[str]
) -> None:
    """Drain a stream of snapshot_diff rows into the replica snapshot
    table at table_path — one merged snapshot version per micro-batch,
    in arrival order (availableNow, the engine's drain idiom)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_diff_batch(batch.sparkSession, batch, table_path, key_cols)

    q = (
        diffs.writeStream.foreachBatch(process)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
