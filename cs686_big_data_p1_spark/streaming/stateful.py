"""Custom stateful streaming operator via applyInPandasWithState.

The reference's HeartbeatMonitor (controller/HeartbeatMonitor.java:24-58)
keeps a mutable per-node map {node -> last heartbeat Date} and scans it
on a timer. The built-in streaming aggregation in liveness.py covers
the max-timestamp part; this module is the *custom state machine*
recast — per-node state carried across micro-batches in the state
store, with arbitrary Python transition logic, the shape any bespoke
stateful operator (sessionization with custom rules, CDC reconciliation,
per-key model state) takes in this engine:

  key            = (host, port)           — the node address
  state          = (last_ts, n_beats, first_ts)
  transition     = fold each micro-batch's beats into the state
  output         = one row per node per batch with the updated state +
                   a liveness verdict against MAX_HEARTBEAT_AGE

The death verdict is an event-time timeout: each update arms a timer at
last_ts + MAX_HEARTBEAT_AGE, and when the stream's global watermark
(delay 0 s, i.e. the max event time seen across ALL nodes) passes that
timer without a newer beat, the key's transition fires with
state.hasTimedOut and emits the 'dead' row. This is the exact streaming
recast of HeartbeatMonitor's "now - last > max-heartbeat-age" scan —
"now" is the stream horizon, not the node's own clock (a node's own
batch max can never age itself out).

Scale: state is one tuple per node (bounded by cluster size, like the
reference's HashMap); each micro-batch shuffles only (host, port)-keyed
beats to their state partition; transition logic is Arrow-batched
pandas, not per-row Python.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

from ..registry import query
from ..views import oracle
from .liveness import (
    _run_to_memory,
    heartbeat_stream,
    nanos_as_long,
    stream_clone,
)

MAX_HEARTBEAT_AGE = datetime.timedelta(milliseconds=30000)  # dfs.properties:3
MAX_HEARTBEAT_AGE_MS = 30000

# The drained stream's final state is a plain aggregation of the whole
# heartbeat history + the age verdict vs the global horizon, so the
# stateful operator gets a full DuckDB oracle, not just a rows-only
# check. 'dead' iff the watermark (global max ts) strictly passed
# last_ts + 30 s — compared at MILLISECOND grain, because Spark's
# event-time watermark and GroupState timers are both ms-floored
# (review r8: a full-precision µs compare can flip the verdict at the
# exact 30 s boundary on a sub-ms-grain fixture where the engine's
# ms-floored timer cannot; current fixtures are whole-second so both
# forms agree, but the oracle must state the grain the engine has).
LIVENESS_STATE_ORACLE = oracle(
    """
SELECT host, port,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       count(*) AS n_beats,
       CASE WHEN (SELECT epoch_us(max(ts)) // 1000 FROM heartbeats)
                 > epoch_us(max(ts)) // 1000 + 30000
            THEN 'dead' ELSE 'alive' END AS status
FROM heartbeats
GROUP BY host, port
"""
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("n_beats", LongType()),
        StructField("first_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("port", IntegerType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("n_beats", LongType()),
        StructField("status", StringType()),
    ]
)


def _epoch_us(ts: Any) -> int:
    t = pd.Timestamp(ts)
    if t.tzinfo is not None:
        t = t.tz_convert("UTC").tz_localize(None)
    return t.value // 1000


def _state_row(host, port, first_us, last_us, n, status) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "host": [host],
            "port": [int(port)],
            "first_ts": [pd.Timestamp(first_us * 1000)],
            "last_ts": [pd.Timestamp(last_us * 1000)],
            "n_beats": [n],
            "status": [status],
        }
    )


def _track_node(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Transition function: fold this batch's heartbeats for one node
    into (last_ts, n_beats, first_ts) state and re-arm the death timer;
    on event-time timeout (watermark passed last_ts + age with no new
    beat) emit the 'dead' verdict and drop the state — the analog of
    HeartbeatMonitor removing the node from the online set."""
    host, port = key
    if state.hasTimedOut:
        last_us, n, first_us = state.get
        # Keep the accumulated (first_ts, n_beats) history instead of
        # state.remove(): if the node resurrects in a later micro-batch
        # the fold continues from the full history — matching the
        # registered oracle, which aggregates ALL of a node's
        # heartbeats. The death timer is not re-armed; a later beat
        # re-arms it on the update path below.
        yield _state_row(host, port, first_us, last_us, n, "dead")
        return
    if state.exists:
        last_us, n, first_us = state.get
    else:
        last_us, n, first_us = None, 0, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts_us = pdf["ts"].map(_epoch_us)
        n += len(pdf)
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    if last_us is None:
        return
    state.update((last_us, n, first_us))
    # Arm the timer one age past the newest beat; clamp above the
    # current watermark (Spark rejects timers at/behind it — the timeout
    # then fires on the very next batch, which is the same verdict).
    deadline_ms = last_us // 1000 + MAX_HEARTBEAT_AGE_MS
    state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
    yield _state_row(host, port, first_us, last_us, n, "alive")


@query("stream_liveness_state", oracle=LIVENESS_STATE_ORACLE)
def stream_liveness_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 as a custom state machine: per-node heartbeat state folded
    across micro-batches with applyInPandasWithState; 'dead' emitted via
    event-time timeout against the global watermark. The drained final
    state is a plain aggregation, so it carries a full DuckDB oracle;
    tests additionally assert batch parity and that silent nodes die."""
    # default (narrow) state width: this machine has one state key per
    # NODE (ten keys) and microseconds of Python per batch — the
    # per-partition store overhead dominates, unlike stream_throttle's
    # hot per-(user,type) fold (python_state_partitions' measured
    # trade only pays past ~hundreds of keys with real per-row work)
    spark = stream_clone(spark)
    with nanos_as_long(spark):
        hb = (
            heartbeat_stream(spark, sf_dir)
            .select("host", "port", "ts")
            # delay 0 s: the watermark IS the max event time across all
            # nodes — the stream horizon the death timers compare against
            .withWatermark("ts", "0 seconds")
        )
        tracked = hb.groupBy("host", "port").applyInPandasWithState(
            _track_node,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        out = _run_to_memory(tracked, "update")
    # The update-mode memory sink appends every micro-batch's rows;
    # reduce to the final verdict per node. A timeout ('dead') row ties
    # with its preceding 'alive' row on (last_ts, n_beats), so 'dead'
    # wins the tie-break ('dead' > 'alive' lexicographically).
    w = Window.partitionBy("host", "port").orderBy(
        F.desc("last_ts"), F.desc("n_beats"), F.desc("status")
    )
    return (
        out.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .drop("rk")
    )
