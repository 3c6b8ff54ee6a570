"""Bucketed storage layout: co-located joins without shuffles.

At 100 TB the chunk-metadata joins (chunks ⋈ replicas ⋈ checksums on
(filename, sequence_no)) dominate the control-plane queries. The
reference co-locates by construction — each storage node holds its own
chunk map (storageNode/StorageNode.java:37) so joins are local. The
Spark-native equivalent is HIVE BUCKETING: persist both tables
`bucketBy(N, keys)` on the join key, and every future join on those
keys is a zero-Exchange sort-merge join — each task reads bucket i of
both sides; no network movement of the fact data, ever.

This module is the write/read path for that layout plus the plan
assertion used by tests: `assert_no_exchange` proves the join really
compiles without a shuffle (the property PLANS.md audits by hand
elsewhere). Bucket counts follow the deployment rule of thumb
(~target-partition-size buckets, fixed per table pair so both sides
agree).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    n_buckets: int = 8,
) -> None:
    """Persist df as a parquet table bucketed AND sorted by `keys` —
    the co-location contract both sides of a recurring join opt into."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_of(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def assert_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan moves data between executors — the
    co-located join's defining property."""
    plan = plan_of(df)
    if "Exchange" in plan.replace("BroadcastExchange", ""):
        raise AssertionError(f"plan contains a shuffle Exchange:\n{plan}")
