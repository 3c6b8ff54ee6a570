"""Plan-shape regression guards (cs686_big_data_p1_spark/plans.py).

tools/plan_audit.py runs the full audit out-of-band; these pytests pin
the two plan properties that have actually regressed or nearly
regressed, so CI catches them without the external tool:

  * no hint-forced broadcast of a fact table (the round-2
    tpch_q3_shipping bug: broadcast() wrapped the orders⋈customer join
    product — an executor OOM at 100x);
  * the guard helper itself detects a deliberately bad plan (so a
    parser regression cannot silently pass everything).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs686_big_data_p1_spark.plans import broadcast_fact_tables, formatted_plan
from tests.conftest import SF_SMALL

FACT_TABLES = {"orders", "lineitem", "events", "documents", "embeddings"}


@pytest.fixture()
def no_auto_broadcast(spark):
    """At test SFs every table is tiny, so Catalyst auto-broadcasts
    plans it never would at 100 TB; with the threshold off, only
    explicit broadcast() hints survive — the set the guard audits."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tpch_joins_never_broadcast_facts(spark, registry, no_auto_broadcast):
    for name in ("tpch_q3_shipping", "tpch_q5_localsupp", "checksum_join"):
        plan = formatted_plan(registry.QUERIES[name](spark, SF_SMALL))
        bad = broadcast_fact_tables(plan, FACT_TABLES)
        assert not bad, f"{name} broadcasts fact table(s) {bad}"


def test_guard_detects_forced_fact_broadcast(spark, no_auto_broadcast):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    l = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    bad_plan = formatted_plan(
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
    )
    assert broadcast_fact_tables(bad_plan, FACT_TABLES) == ["orders"]
