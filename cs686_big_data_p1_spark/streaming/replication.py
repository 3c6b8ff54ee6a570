"""T4 end-to-end: the re-replication control loop as a standing
streaming pipeline.

The reference runs this as a 10-second polling thread
(controller/ChunkReplicationRunnable.java:33-74): read the current
liveness map, find under-replicated chunks, pick targets and a source,
enqueue OrderSendChunk messages (controller/MessageSender.java:24-49
drains them to the nodes). Here the poll becomes a micro-batch trigger:

  heartbeat stream --(complete-mode max(ts) per node)--> foreachBatch:
      liveness snapshot -> online set (40-min age, same rule as the
      batch views) -> under_replicated ⋈ placement_pick ⋈
      failover_choice -> orders

Each micro-batch recomputes the full order book from the latest
liveness snapshot — exactly the reference's semantics, where every poll
re-derives orders from the current FileTable + heartbeat map (stale
orders are simply superseded; the FIFO queue machinery collapses into
the sink's latest-batch-wins semantics).

Scale: the per-node liveness state is O(#nodes); the per-batch order
computation is the same shuffle-safe batch plan as replication_orders
(broadcast node list, windowed seeded pick); nothing driver-side except
the trigger itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dfs_meta import REPLICATION_ORDERS_ORACLE, replication_orders
from ..registry import query
from ..views import MAX_HEARTBEAT_AGE_SQL
from .liveness import (
    batch_fold_partitions,
    heartbeat_stream,
    nanos_as_long,
    stream_clone,
)


@query("stream_replication_orders", oracle=REPLICATION_ORDERS_ORACLE)
def stream_replication_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 as a standing streaming query. ORACLE-EXACT (r9): an
    AvailableNow drain's FINAL micro-batch sees the complete-mode
    liveness snapshot over every heartbeat in the fixture, and its
    online cutoff (max last_ts - {MAX_HEARTBEAT_AGE}) is precisely the
    rule views.online_nodes_df / the oracle prelude's online_nodes CTE
    apply to the batch table — so the returned order book equals batch
    replication_orders' and shares REPLICATION_ORDERS_ORACLE verbatim
    (every intermediate batch's book is superseded, the reference's
    stale-order semantics). The parity pytest additionally pins
    stream ≡ batch row-for-row."""
    # heavy-fold drain: the in-batch order book is a corpus-scale
    # batch plan — clone at batch-plan width (liveness.py rationale)
    spark = stream_clone(spark, batch_fold_partitions(spark))
    result: dict[str, DataFrame] = {}

    def emit_orders(snapshot: DataFrame, batch_id: int) -> None:
        # complete-mode snapshot = the controller's full heartbeat map.
        # Online = within the age window of the snapshot horizon (the
        # same rule views.online_nodes_df applies to the batch table).
        cutoff = snapshot.agg(
            (F.max("last_ts") - F.expr(MAX_HEARTBEAT_AGE_SQL)).alias("cutoff")
        )
        online = (
            snapshot.crossJoin(F.broadcast(cutoff))
            .where(F.col("last_ts") >= F.col("cutoff"))
            .select("host", "port")
        )
        orders = replication_orders(snapshot.sparkSession, sf_dir, online)
        # materialize now: the snapshot frame dies with the micro-batch
        result["orders"] = orders.localCheckpoint(eager=True)

    with nanos_as_long(spark):
        hb = heartbeat_stream(spark, sf_dir).select("host", "port", "ts")
        last_seen = hb.groupBy("host", "port").agg(
            F.max("ts").alias("last_ts")
        )
        # state-partition sizing comes from the stream_clone() session
        # (liveness.py rationale) — no session-global mutate-and-restore
        # (review r8); the in-batch order derivation is
        # control-plane-sized too
        q = (
            last_seen.writeStream.outputMode("complete")
            .foreachBatch(emit_orders)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if "orders" not in result:
        # No micro-batch fired (empty/missing heartbeat fixture):
        # fail descriptively instead of a bare KeyError.
        raise RuntimeError(
            "stream_replication_orders: heartbeat source produced no "
            f"micro-batch under {sf_dir!r} (missing or empty events "
            "fixture) — no liveness snapshot to derive orders from"
        )
    return result["orders"]
