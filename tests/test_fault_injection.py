"""Fault-injection drill (SURVEY §5.2 item 5): the relational analog of
the reference's manual bass-cluster test — kill a storage node, watch
the control plane respond. The replication chain's `online` parameter
(added for the streaming T4 loop) lets the test inject the failure
without fixture surgery."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs686_big_data_p1_spark.operators.dfs_meta import (
    replication_orders,
    under_replicated,
)
from cs686_big_data_p1_spark.views import online_nodes_df, replicas_df
from tests.conftest import SF_SMALL


def test_node_kill_triggers_re_replication(spark):
    online = online_nodes_df(spark, SF_SMALL)
    victim = online.orderBy("host", "port").first()
    survivors = online.where(
        ~((F.col("host") == victim.host) & (F.col("port") == victim.port))
    )

    before = {
        (r.filename, r.sequence_no): r.n_missing
        for r in under_replicated(spark, SF_SMALL).collect()
    }
    after = {
        (r.filename, r.sequence_no): r.n_missing
        for r in under_replicated(spark, SF_SMALL, survivors).collect()
    }

    held = {
        (r.filename, r.sequence_no)
        for r in replicas_df(spark, SF_SMALL)
        .where(
            (F.col("host") == victim.host) & (F.col("port") == victim.port)
        )
        .collect()
    }
    assert held, "victim held no replicas; fixture too small for the drill"

    # chunks that held a replica on the victim (and sat at or below the
    # replication minimum) must each report exactly one more missing
    # replica; everything else is untouched
    degraded = {k for k in after if after[k] > before.get(k, 0)}
    assert degraded, "the kill surfaced no degradation"
    assert degraded <= held
    for k in degraded:
        assert after[k] == before.get(k, 0) + 1
    for k in set(after) - degraded:
        assert after[k] == before[k]
        assert k not in held or after[k] == before[k]
    assert set(before) <= set(after)  # a kill never repairs anything

    # the new order book covers every degraded chunk that still has a
    # surviving source, and never routes to or from the dead node
    salvageable = {
        (r.filename, r.sequence_no)
        for r in replicas_df(spark, SF_SMALL)
        .join(survivors, ["host", "port"], "left_semi")
        .select("filename", "sequence_no")
        .distinct()
        .collect()
    }
    orders = replication_orders(spark, SF_SMALL, survivors).collect()
    ordered_chunks = {(r.filename, r.sequence_no) for r in orders}
    assert (degraded & salvageable) <= ordered_chunks
    for r in orders:
        assert (r.from_host, r.from_port) != (victim.host, victim.port)
        assert (r.to_host, r.to_port) != (victim.host, victim.port)


def test_rendezvous_placement_minimal_churn(spark):
    """HRW's defining guarantee: removing one node re-places ONLY the
    chunks that had ranked that node in their top MIN_REPLICAS — every
    other (chunk -> node, rank) assignment survives bit-identically.
    This is the property that makes the strategy deployable at 100 TB
    (a node failure moves ~1/N of the data, not a cluster reshuffle)."""
    from cs686_big_data_p1_spark.operators.dfs_meta import (
        rendezvous_placement,
    )
    from cs686_big_data_p1_spark.views import nodes_df

    # inject the full 10-node membership view (sf0.001's heartbeat
    # fixture leaves only one node live, which can't exercise churn)
    online = nodes_df(spark).select("host", "port")
    victim = online.orderBy("host", "port").first()
    survivors = online.where(
        ~((F.col("host") == victim.host) & (F.col("port") == victim.port))
    )

    def placements(o):
        out = {}
        for r in rendezvous_placement(spark, SF_SMALL, online=o).collect():
            out.setdefault((r.filename, r.sequence_no), []).append(
                (r.replica_rank, r.host, r.port)
            )
        return {k: sorted(v) for k, v in out.items()}

    before = placements(online)
    after = placements(survivors)
    assert set(before) == set(after)  # every chunk still placed
    touched = kept = 0
    for key, b in before.items():
        had_victim = any(
            h == victim.host and p == victim.port for _, h, p in b
        )
        if had_victim:
            touched += 1
        else:
            kept += 1
            assert after[key] == b  # bit-stable assignment
    assert touched > 0 and kept > 0  # the drill exercised both sides
