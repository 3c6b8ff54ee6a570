"""Bucketed co-located joins (sources/bucketing.py): the 100 TB storage
layout for the chunk-metadata join family. The assertion that matters:
a join of two tables bucketed+sorted on the join key compiles WITHOUT
any shuffle Exchange, while the same join over plain parquet shuffles
both sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs686_big_data_p1_spark.sources.bucketing import (
    assert_no_exchange,
    plan_of,
    read_table,
    write_bucketed,
)
from cs686_big_data_p1_spark.views import chunks_df, replicas_df
from tests.conftest import SF_SMALL

KEYS = ["filename", "sequence_no"]


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    c = chunks_df(spark, SF_SMALL).select(
        "filename", "sequence_no", "size", "checksum"
    )
    r = replicas_df(spark, SF_SMALL)
    write_bucketed(c, "b_chunks", str(tmp_path / "c"), KEYS)
    write_bucketed(r, "b_replicas", str(tmp_path / "r"), KEYS)
    try:
        joined = read_table(spark, "b_chunks").join(
            read_table(spark, "b_replicas"), KEYS
        )
        # the co-located join: no Exchange anywhere in the plan
        assert_no_exchange(joined)
        # and it still computes the right thing
        want = c.join(r, KEYS).count()
        assert joined.count() == want
        assert want > 0

        # control: the same join over non-bucketed frames shuffles
        shuffled = c.join(r.hint("merge"), KEYS)
        assert "Exchange" in plan_of(shuffled).replace("BroadcastExchange", "")

        # a narrower join key than the bucket spec would NOT be
        # co-partitioned; the helper must catch that regression
        half = read_table(spark, "b_chunks").join(
            read_table(spark, "b_replicas").drop("sequence_no"), ["filename"]
        )
        with pytest.raises(AssertionError):
            assert_no_exchange(half.groupBy("filename").agg(F.count("*")))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_chunks")
        spark.sql("DROP TABLE IF EXISTS b_replicas")


def test_dynamic_partition_pruning_on_chunk_store(spark, tmp_path):
    """DPP: joining the filename-partitioned chunk store against a
    FILTERED dimension must prune the fact scan's partitions at
    runtime (the dim filter's values are not known statically). The
    plan must carry a dynamicpruning subquery on the partition key."""
    from cs686_big_data_p1_spark.sources.chunk_io import (
        chunk_bytes,
        write_chunks,
    )

    store = str(tmp_path / "store")
    for i in range(6):
        write_chunks(
            chunk_bytes(spark, bytes([i]) * 2500, f"f{i}.dat", 1000), store
        )
    fact = spark.read.parquet(store)
    dim = spark.createDataFrame(
        [(f"f{i}.dat", i % 2) for i in range(6)], "filename string, odd int"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
    joined = fact.join(dim.where(F.col("odd") == 1), "filename").select(
        "filename", "sequence_no"
    )
    plan = plan_of(joined)
    assert "dynamicpruning" in plan.lower(), plan
    got = {(r.filename, r.sequence_no) for r in joined.collect()}
    assert {f for f, _ in got} == {"f1.dat", "f3.dat", "f5.dat"}
    assert len(got) == 9  # 3 files x 3 chunks
