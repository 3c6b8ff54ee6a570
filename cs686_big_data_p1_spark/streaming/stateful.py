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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..registry import query
from .liveness import _run_to_memory, heartbeat_stream

MAX_HEARTBEAT_AGE = datetime.timedelta(milliseconds=30000)  # dfs.properties:3

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


def _track_node(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Transition function: fold this batch's heartbeats for one node
    into (last_ts, n_beats, first_ts) state; emit the updated row."""
    host, port = key
    if state.exists:
        last_us, n, first_us = state.get
    else:
        last_us, n, first_us = None, 0, None
    batch_max_us = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts_us = pdf["ts"].map(_epoch_us)
        n += len(pdf)
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
        batch_max_us = hi if batch_max_us is None else max(batch_max_us, hi)
    if last_us is None:
        return
    state.update((last_us, n, first_us))
    # Liveness verdict relative to the batch horizon — the streaming
    # analog of HeartbeatMonitor's "now - last > max-heartbeat-age".
    horizon_us = batch_max_us if batch_max_us is not None else last_us
    age = datetime.timedelta(microseconds=horizon_us - last_us)
    status = "dead" if age > MAX_HEARTBEAT_AGE else "alive"
    yield pd.DataFrame(
        {
            "host": [host],
            "port": [int(port)],
            "first_ts": [pd.Timestamp(first_us * 1000)],
            "last_ts": [pd.Timestamp(last_us * 1000)],
            "n_beats": [n],
            "status": [status],
        }
    )


@query("stream_liveness_state")
def stream_liveness_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 as a custom state machine: per-node heartbeat state folded
    across micro-batches with applyInPandasWithState. Rows-only check
    (stateful streaming is not SQL-expressible); tests assert the final
    state equals the batch aggregation."""
    hb = heartbeat_stream(spark, sf_dir).select("host", "port", "ts")
    tracked = hb.groupBy("host", "port").applyInPandasWithState(
        _track_node,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(tracked, "update")
