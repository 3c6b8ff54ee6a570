"""Snapshot-table (time travel) semantics: atomic publish, version
pinning, and vacuum isolation (sources/snapshots.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs686_big_data_p1_spark.sources.snapshots import (
    read_snapshot,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
)


def test_snapshot_time_travel_roundtrip(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    v1 = write_snapshot(spark, spark.range(5).withColumn("v", F.col("id") * 2), tbl)
    v2 = write_snapshot(spark, spark.range(3).withColumn("v", F.col("id") * 7), tbl)
    assert (v1, v2) == (1, 2)
    assert snapshot_versions(spark, tbl) == [1, 2]
    # latest == v2, pinned read == v1, both exact
    assert {(r.id, r.v) for r in read_snapshot(spark, tbl).collect()} == {
        (i, i * 7) for i in range(3)
    }
    assert {
        (r.id, r.v) for r in read_snapshot(spark, tbl, 1).collect()
    } == {(i, i * 2) for i in range(5)}


def test_snapshot_stage_invisible_and_vacuum(spark, tmp_path):
    import os

    tbl = str(tmp_path / "tbl")
    for k in range(4):
        write_snapshot(spark, spark.range(k + 1), tbl)
    # a leftover staging dir must not surface as a version
    os.makedirs(os.path.join(tbl, ".stage-v00000099"))
    assert snapshot_versions(spark, tbl) == [1, 2, 3, 4]

    # a reader plan pinned to v2 survives vacuum of v1
    pinned = read_snapshot(spark, tbl, 2)
    dropped = vacuum_snapshots(spark, tbl, keep_last=3)
    assert dropped == [1]
    assert snapshot_versions(spark, tbl) == [2, 3, 4]
    assert pinned.count() == 2
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, tbl, 1)
    with pytest.raises(ValueError):
        vacuum_snapshots(spark, tbl, keep_last=0)


def test_snapshot_empty_table_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nope"))
