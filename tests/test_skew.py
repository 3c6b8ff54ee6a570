"""AQE skew-join validation: README/SURVEY claim AQE as the runtime
safety net for skewed join keys (hot filenames, boilerplate dedup
buckets). This test proves the claim on this Spark build — a join with
one pathological hot key must show skew-split AQEShuffleRead nodes in
the executed plan rather than one straggler partition."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    # thresholds scaled down so the fixture-sized hot key trips the
    # same code path a hot filename would at cluster scale; broadcast
    # off so the join actually shuffles
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n = 200_000
        # incompressible payload: shuffle sizes are compressed bytes,
        # so a constant pad would dedupe the hot partition under the
        # skew threshold and mask the effect
        pad = F.md5(F.col("id").cast("string"))
        # left: 95% of rows share key 0; right: uniform keys
        left = spark.range(n).select(
            F.when(F.col("id") % 20 != 0, 0)
            .otherwise(F.col("id") % 997)
            .alias("k"),
            pad.alias("pl"),
        )
        right = spark.range(997).select(
            F.col("id").alias("k"), pad.alias("pr")
        )
        joined = left.join(right, "k").select("k", "pl")
        # execute THIS dataframe's own query execution: AQE finalizes
        # the plan per-execution, so count()/write would inspect a
        # different (re-planned) execution than the one asserted on
        rows = joined.collect()
        assert len(rows) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan and "skewed" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
