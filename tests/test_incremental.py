"""Incremental materialized-aggregate maintenance: any batch
interleaving must equal one full recompute (sources/incremental.py),
and a batch must rewrite only the day partitions it touches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cs686_big_data_p1_spark.sources.incremental import (
    maintain_daily_order_stats,
    read_daily_order_stats,
)
from tests.conftest import SF_SMALL


def test_incremental_equals_full_recompute_and_prunes(spark, tmp_path):
    store = str(tmp_path / "daily_stats")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    # three uneven batches, split by orderkey so days interleave
    b1 = orders.where(F.col("o_orderkey") % 3 == 0)
    b2 = orders.where(F.col("o_orderkey") % 3 == 1)
    b3 = orders.where(F.col("o_orderkey") % 3 == 2)

    maintain_daily_order_stats(spark, store, b1)
    maintain_daily_order_stats(spark, store, b2)

    # partition pruning: a batch touching one known day must leave
    # every other day partition untouched on disk
    one_day = (
        b3.select(F.date_trunc("day", "o_orderdate").alias("day"))
        .groupBy("day").count().orderBy(F.desc("count")).first()["day"]
    )
    b3_day = b3.where(F.date_trunc("day", "o_orderdate") == F.lit(one_day))
    b3_rest = b3.where(F.date_trunc("day", "o_orderdate") != F.lit(one_day))

    def files():
        out = {}
        for d in os.listdir(store):
            if d.startswith("day="):
                p = os.path.join(store, d)
                out[d] = {
                    f for f in os.listdir(p) if f.endswith(".parquet")
                }
        return out

    before = files()
    maintain_daily_order_stats(spark, store, b3_day)
    after = files()
    # dynamic overwrite writes fresh UUID-named part files: only the
    # touched day's file set may differ (name escaping: ':' -> %3A)
    day_dir = "day=" + str(one_day).replace(":", "%3A")
    changed = {
        d
        for d in set(before) | set(after)
        if before.get(d) != after.get(d)
    }
    assert changed == {day_dir}, (changed, day_dir)

    maintain_daily_order_stats(spark, store, b3_rest)

    got = {
        (r.day, r.o_orderpriority): (r.n_orders, r.sum_total)
        for r in read_daily_order_stats(spark, store).collect()
    }
    full = {
        (r.day, r.o_orderpriority): (r.n_orders, r.sum_total)
        for r in orders.groupBy(
            F.date_trunc("day", "o_orderdate").alias("day"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,6)") * 1_000_000)
                .cast("decimal(38,0)")
            ).alias("t"),
        )
        .select(
            "day",
            "o_orderpriority",
            "n_orders",
            F.expr(
                "CAST(t div 1000000 AS DOUBLE)"
                " + CAST(CAST(pmod(t, 1000000) AS BIGINT) AS DOUBLE)"
                " / 1000000.0"
            ).alias("sum_total"),
        )
        .collect()
    }
    assert got == full


def test_incremental_corrupt_store_raises_not_resets(spark, tmp_path):
    """A store that EXISTS but cannot be read (corrupt parquet footer)
    must raise — never be mistaken for 'first batch', which would
    silently discard the accumulated aggregates for those days."""
    import pytest

    store = str(tmp_path / "daily_stats")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").limit(50)
    maintain_daily_order_stats(spark, store, orders)
    before = {
        (r.day, r.o_orderpriority): r.n_orders
        for r in read_daily_order_stats(spark, store).collect()
    }
    # corrupt every data file in place
    for root, _dirs, names in os.walk(store):
        for n in names:
            if n.endswith(".parquet"):
                with open(os.path.join(root, n), "wb") as f:
                    f.write(b"not a parquet file")
    with pytest.raises(Exception):
        maintain_daily_order_stats(spark, store, orders)
    # and a healthy store is still folded into, not reset (regression
    # guard for the existence-probe refactor)
    store2 = str(tmp_path / "daily_stats2")
    maintain_daily_order_stats(spark, store2, orders)
    maintain_daily_order_stats(spark, store2, orders)
    doubled = {
        (r.day, r.o_orderpriority): r.n_orders
        for r in read_daily_order_stats(spark, store2).collect()
    }
    assert doubled == {k: 2 * v for k, v in before.items()}
