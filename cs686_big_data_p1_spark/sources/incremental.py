"""Incremental materialized-aggregate maintenance.

The pattern behind every "daily rollup" table at 100 TB: the
aggregate store holds MERGEABLE partial aggregates (counts and exact
scaled-integer sums — never averages, which don't merge), and a new
batch of fact rows updates it by (1) partially aggregating ONLY the
batch, (2) merging with the store rows of the AFFECTED partitions
(partition-pruned read via upsert_parquet_partitioned's machinery),
and (3) rewriting only those partitions. Cost scales with the batch
and the partitions it touches — never with the store, never with the
fact history. inventory_delta (operators/dfs_meta.py) is the row-set
sibling; this is the aggregate-state sibling.

The invariant the pytest pins: any interleaving of batches produces
BYTE-identical state to one full recompute over the union of all
batches — mergeability (sum/count are commutative monoids over exact
integers) makes the maintenance path invisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .formats import upsert_parquet_partitioned


def maintain_daily_order_stats(
    spark: SparkSession, store_path: str, new_orders: DataFrame
) -> None:
    """Fold a batch of order rows into the (day, priority)-grained
    aggregate store: n_orders (count) and exact 1e6-scaled total
    (decimal(38,0) partial sum, stored as its string rendering so the
    parquet schema stays engine-portable). Day is the partition
    column — a batch touches only the days it contains."""
    delta = (
        new_orders.select(
            F.date_trunc("day", "o_orderdate").alias("day"),
            "o_orderpriority",
            "o_totalprice",
        )
        .groupBy("day", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,6)") * 1_000_000)
                .cast("decimal(38,0)")
            ).alias("total_e6"),
        )
    )
    # First-batch detection is an explicit existence probe, NOT a bare
    # except around the read: a corrupt footer, permission error, or
    # transient FS failure must propagate instead of being mistaken
    # for "no store yet" and silently discarding accumulated state for
    # the batch's days.
    jvm = spark.sparkContext._jvm
    store_jpath = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = store_jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    if fs.exists(store_jpath):
        days = [r[0] for r in delta.select("day").distinct().collect()]
        base = spark.read.parquet(store_path).where(F.col("day").isin(days))
        merged = (
            base.select(
                "day",
                "o_orderpriority",
                "n_orders",
                F.col("total_e6").cast("decimal(38,0)").alias("total_e6"),
            )
            .unionByName(delta)
            .groupBy("day", "o_orderpriority")
            .agg(
                F.sum("n_orders").alias("n_orders"),
                F.sum("total_e6").alias("total_e6"),
            )
        )
    else:  # first batch: store does not exist yet
        merged = delta
    merged = merged.select(
        "day",
        "o_orderpriority",
        "n_orders",
        F.col("total_e6").cast("string").alias("total_e6"),
    )
    upsert_parquet_partitioned(
        spark, store_path, merged, ["day", "o_orderpriority"], "day"
    )


def read_daily_order_stats(spark: SparkSession, store_path: str) -> DataFrame:
    """The maintained aggregate with the exact total unscaled to
    double (quotient/remainder split, the engine's standard)."""
    s = spark.read.parquet(store_path).withColumn(
        "total_e6", F.col("total_e6").cast("decimal(38,0)")
    )
    return s.select(
        "day",
        "o_orderpriority",
        "n_orders",
        F.expr(
            "CAST(total_e6 div 1000000 AS DOUBLE)"
            " + CAST(CAST(pmod(total_e6, 1000000) AS BIGINT) AS DOUBLE)"
            " / 1000000.0"
        ).alias("sum_total"),
    )
