"""Streaming trend detection: watermarked tumbling-window top-K event
types — the live dashboard query every event pipeline ends with.

Extends the reference's periodic heartbeat accounting
(controller/HeartbeatMonitor.java's timer scan) to the user event
stream: instead of one liveness counter per node, a windowed leaderboard
per hour. The windowed count runs INSIDE the stream (watermarked state,
append emission — each finalized window leaves state exactly once);
the tiny top-K ranking runs on the drained, already-aggregated result,
which is windows x event-types sized, not events-sized — the standard
"aggregate in-stream, rank downstream" split.

Oracle: the batch tumbling count filtered by the SAME finalization
predicate append mode applies (window_end <= final watermark =
max(ts) - delay), ranked identically — the stream_hb_session idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from .liveness import (
    _run_to_memory,
    events_stream,
    nanos_as_long,
    stream_clone,
)

TRENDING_K = 3
TRENDING_DELAY = "90 minutes"  # watermark: late-event allowance

TRENDING_ORACLE = f"""
WITH wc AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n
  FROM events
  GROUP BY date_trunc('hour', ts), event_type
),
fin AS (
  SELECT * FROM wc
  WHERE window_start + INTERVAL 1 HOUR
        <= (SELECT max(ts) FROM events) - INTERVAL 90 MINUTE
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       event_type, n,
       rnk
FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY window_start ORDER BY n DESC, event_type) AS INTEGER)
      AS rnk
  FROM fin
)
WHERE rnk <= {TRENDING_K}
"""


# events_stream now lives in liveness.py beside heartbeat_stream — the
# ONE ts-unit branch every stream builds on (review r8; imported above
# and re-exported here for existing callers/tests).


@query("stream_trending", oracle=TRENDING_ORACLE)
def stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TRENDING_K} trending event types per tumbling hour over
    the live event stream. In-stream: watermarked ({TRENDING_DELAY})
    windowed counts, append mode — state is one counter per open
    (window, event_type), bounded by windows-in-flight x #types, and
    each window is emitted exactly once when the watermark passes its
    end. Downstream of the drain: a per-window row_number top-K over
    the aggregated (not raw) rows — window_start is a high-cardinality
    partitioning key and each partition holds at most #event_types
    rows, so the rank is trivially bounded at any scale."""
    spark = stream_clone(spark)  # session-local drain conf
    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir).select("ts", "event_type")
        counts = (
            ev.withWatermark("ts", TRENDING_DELAY)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type",
                "n",
            )
        )
        drained = _run_to_memory(counts, "append")
    rnk_w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        drained.withColumn("rnk", F.row_number().over(rnk_w).cast("int"))
        .where(F.col("rnk") <= TRENDING_K)
        .select("window_start", "window_end", "event_type", "n", "rnk")
    )


ATTRIBUTION_WINDOW = "1 hour"  # view must precede purchase by <= this

ATTRIBUTION_ORACLE = """
SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
       p.ts AS purchase_ts, v.ts AS view_ts,
       (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS lag_s
FROM events p JOIN events v
  ON v.user_id = p.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
"""


@query("stream_attribution", oracle=ATTRIBUTION_ORACLE)
def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-attribution STREAM-STREAM JOIN: every purchase pairs
    with each view by the same user in the preceding {ATTRIBUTION_WINDOW}
    — the canonical watermarked self-join (Spark's ad-monetization
    example, recast on the events fixture).

    Both sides carry a 2-hour watermark and the join condition is an
    equi-join on user_id PLUS the event-time range — exactly the shape
    Structured Streaming needs to bound state: view rows older than
    (watermark - {ATTRIBUTION_WINDOW}) leave the state store because no
    future purchase can reach them. INNER join semantics emit each
    match exactly once and withhold nothing, so the drained result
    hash-compares against the batch range-join oracle with no
    finalization predicate. lag_s is exact integer microsecond math
    (the event_sessionize rationale)."""
    spark = stream_clone(spark)  # session-local drain conf
    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir)
        views = (
            ev.where(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "2 hours")
        )
        purchases = (
            ev.where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "2 hours")
        )
        joined = purchases.join(
            views,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (
                F.col("view_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
            ),
        ).select(
            "user_id",
            "purchase_id",
            "view_id",
            "purchase_ts",
            "view_ts",
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(view_ts))"
                " div 1000000"
            ).alias("lag_s"),
        )
        return _run_to_memory(joined, "append")


ATTRIBUTION_OUTER_ORACLE = """
WITH w AS (
  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'view'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
         - INTERVAL 2 HOUR AS wm
),
matched AS (
  SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
         p.ts AS purchase_ts, v.ts AS view_ts,
         (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS lag_s
  FROM events p JOIN events v
    ON v.user_id = p.user_id
   AND p.event_type = 'purchase' AND v.event_type = 'view'
   AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
)
SELECT * FROM matched
UNION ALL
SELECT p.user_id, p.event_id AS purchase_id, CAST(NULL AS BIGINT) AS view_id,
       p.ts AS purchase_ts, CAST(NULL AS TIMESTAMP) AS view_ts,
       CAST(NULL AS BIGINT) AS lag_s
FROM events p, w
WHERE p.event_type = 'purchase'
  AND p.ts < w.wm
  AND NOT EXISTS (
    SELECT 1 FROM events v
    WHERE v.event_type = 'view' AND v.user_id = p.user_id
      AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
  )
"""


@query("stream_attribution_outer", oracle=ATTRIBUTION_OUTER_ORACLE)
def stream_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_attribution's LEFT OUTER sibling (VERDICT r9 #7) — the
    production attribution shape: every purchase emits, matched
    purchases once per preceding-hour view, UNMATCHED purchases once
    with NULL view columns as soon as the watermark CLOSES their match
    range (no view with view_ts <= purchase_ts can still arrive once
    the global watermark passes purchase_ts). That is Structured
    Streaming's state-eviction contract for outer stream-stream joins:
    the null-joined row is emitted exactly when the purchase row
    leaves the state store, so state stays bounded by the watermark
    horizon and the output is still append-only.

    Oracle finalization predicate: matched rows are withheld never
    (inner matches emit on sight, as in stream_attribution); an
    unmatched purchase is emitted iff purchase_ts < final watermark —
    STRICT, because Spark's outer-join state eviction compares event
    time strictly against the watermark, so a purchase landing exactly
    ON the watermark is still held (measured empirically, pinned by
    the boundary row in test_stream_attribution_outer_finalization;
    ADVICE r10) — where the final global watermark = least(max
    view_ts, max purchase_ts) - 2h (Spark takes the MIN across both
    inputs' per-side watermarks). Purchases whose match window was still open
    when the drain ended are (correctly) withheld — the
    stream_sessionize finalization idiom applied to a join.

    Scale: identical state shape to stream_attribution (equi-key on
    user_id + event-time range bounds both stores); the outer emission
    adds no state, only the eviction-time null flush."""
    spark = stream_clone(spark)  # session-local drain conf
    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir)
        views = (
            ev.where(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "2 hours")
        )
        purchases = (
            ev.where(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "2 hours")
        )
        joined = purchases.join(
            views,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (
                F.col("view_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
            ),
            "left_outer",
        ).select(
            "user_id",
            "purchase_id",
            "view_id",
            "purchase_ts",
            "view_ts",
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(view_ts))"
                " div 1000000"
            ).alias("lag_s"),
        )
        return _run_to_memory(joined, "append")


# --- Streaming kept-anchor throttle (event_throttle's live sibling) ---

_THROTTLE_OUT_SCHEMA = (
    "user_id long, event_type string, ts timestamp, event_id long"
)
_THROTTLE_STATE_SCHEMA = "last_kept_us long"


def _throttle_state_fn(key, pdfs, state):
    """Fold one (user, type) group's micro-batch through the kept-
    anchor recurrence, carrying last_kept_us across batches. Emission
    is final at decision time (append semantics): a kept event can
    never be retracted by later IN-ORDER data, which the file stream
    delivers (same single-source ordering contract the batch operator
    sorts into existence).

    The group's rows arrive as an ITERATOR of Arrow chunks in
    shuffle-fetch order — applyInPandasWithState sorts the partition
    by grouping key only, NOT within the group — so all chunks are
    concatenated and sorted ONCE before the recurrence runs (review
    r8: per-chunk sorting let a group spanning multiple chunks — more
    rows than arrow.maxRecordsPerBatch, or a multi-split source —
    advance the anchor past timestamps still waiting in a later
    chunk, silently diverging from the batch operator). The concat is
    bounded by one group's rows in one micro-batch."""
    import pandas as pd

    from cs686_big_data_p1_spark.operators.sessions import THROTTLE_GAP_S

    user_id, event_type = key
    last_us = state.get[0] if state.exists else None
    gap_us = THROTTLE_GAP_S * 1_000_000
    chunks = [pdf for pdf in pdfs if len(pdf) > 0]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        keep_rows = []
        for ts, eid in zip(pdf["ts"], pdf["event_id"]):
            t = pd.Timestamp(ts)
            if t.tzinfo is not None:
                t = t.tz_convert("UTC").tz_localize(None)
            t_us = t.value // 1000
            if last_us is None or t_us - last_us > gap_us:
                keep_rows.append((ts, eid))
                last_us = t_us
        if keep_rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(keep_rows),
                    "event_type": [event_type] * len(keep_rows),
                    "ts": [r[0] for r in keep_rows],
                    "event_id": [r[1] for r in keep_rows],
                }
            )
    if last_us is not None:
        state.update((last_us,))


def _stream_throttle_oracle() -> str:
    from ..operators.sessions import THROTTLE_ORACLE

    return THROTTLE_ORACLE


@query("stream_throttle", oracle=_stream_throttle_oracle())
def stream_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_throttle LIVE: the kept-anchor rate limit as an
    applyInPandasWithState machine — state is ONE long (last kept
    timestamp) per (user, event_type), folded across micro-batches;
    kept events emit in append mode at decision time. On the in-order
    fixture stream the drained output is exactly the batch operator's
    row set (parity pytest), so it shares the batch operator's
    recursive-CTE oracle (sessions.THROTTLE_ORACLE) and registers
    ORACLE-EXACT (r9 — the kept-anchor recurrence is expressible as a
    recursive anchor walk after all). State is O(#active (user,type)
    keys) x 8 bytes — the bounded-state shape every stateful operator
    in this engine maintains. State width = one partition per core
    (python_state_partitions): the Arrow-Python fold dominates the
    state stores' fixed cost, the opposite trade from JVM-agg
    streams."""
    from .liveness import python_state_partitions

    spark = stream_clone(spark, python_state_partitions(spark))
    from pyspark.sql.streaming.state import GroupStateTimeout

    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir).select(
            "user_id", "event_type", "ts", "event_id"
        )
        kept = ev.groupBy("user_id", "event_type").applyInPandasWithState(
            _throttle_state_fn,
            outputStructType=_THROTTLE_OUT_SCHEMA,
            stateStructType=_THROTTLE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        return _run_to_memory(kept, "append")


DEDUP_TTL_DELAY = "2 hours"  # duplicate-arrival allowance (state TTL)


STREAM_DEDUP_TTL_ORACLE = """
SELECT event_id, ts, user_id, event_type FROM events
"""


@query("stream_dedup_ttl", oracle=STREAM_DEDUP_TTL_ORACLE)
def stream_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-TTL'd streaming dedup (dropDuplicatesWithinWatermark):
    duplicate EVENTS arriving within {DEDUP_TTL_DELAY} of the original
    are suppressed, and — the part stream_dedup_exact's accumulating
    dropDuplicates cannot do — each key's state is EVICTED once the
    watermark passes its event time, so state is bounded by the
    duplicate-arrival window instead of growing with every distinct
    key ever seen. On an unbounded 100 TB ingest that is the
    difference between O(in-flight window) and O(corpus) state: the
    accumulating form is right for bounded re-publishable corpora
    (documents), the TTL form for infinite event firehoses where a
    duplicate can only arrive near its original (at-least-once
    delivery retries).

    Dedup key: event_id. dropDuplicatesWithinWatermark emits each
    key's FIRST arrival eagerly (emission is not watermark-gated —
    only state eviction is), so on the duplicate-free fixture the
    drained output is exactly the events table, row for row — the
    oracle is that identity and this registers ORACLE-EXACT (r9; was
    rows-only). The planted-duplicate semantics — in-window duplicate
    suppressed, key evicted after the watermark — are pinned by
    tests/test_streaming.py on a purpose-built stream.
    """
    spark = stream_clone(spark)  # session-local drain conf
    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir)
        out = (
            ev.select("event_id", "ts", "user_id", "event_type")
            .withWatermark("ts", DEDUP_TTL_DELAY)
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        return _run_to_memory(out, "append")


@query("stream_distinct_users")
def stream_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active users per tumbling hour, maintained IN-STREAM
    with the HLL++ sketch (approx_count_distinct): state per open
    window is one fixed-size sketch, not a user set — the only way a
    distinct count fits streaming state at 100 TB (the exact set is
    O(users/window); the sketch is O(1) and mergeable across
    partitions and micro-batches alike). Append mode + watermark:
    each window's count finalizes exactly once. Batch anchor:
    distinct_customers_approx (same sketch, same rsd) and the
    tolerance pytest vs the exact per-window distinct.
    """
    spark = stream_clone(spark)  # session-local drain conf
    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir).select("ts", "user_id")
        counts = (
            ev.withWatermark("ts", TRENDING_DELAY)
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.approx_count_distinct("user_id", 0.02).alias(
                    "approx_users"
                )
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "approx_users",
            )
        )
        return _run_to_memory(counts, "append")


SESSIONIZE_DELAY = "40 minutes"  # watermark: late-event allowance

def _stream_sessionize_oracle() -> str:
    from ..operators.sessions import SESSION_GAP_S, SESSIONIZE_ORACLE

    return f"""
WITH sess AS ({SESSIONIZE_ORACLE})
SELECT user_id, session_start, session_end, n_events, n_purchases,
       total_value
FROM sess
WHERE session_end + INTERVAL {SESSION_GAP_S} SECOND
      <= (SELECT max(ts) FROM events) - INTERVAL {SESSIONIZE_DELAY}
"""


@query("stream_sessionize", oracle=_stream_sessionize_oracle())
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_sessionize's streaming sibling (VERDICT r6/r7 gap #4):
    per-user session windows (30-minute gap) maintained IN-STREAM via
    session_window() + watermark, append mode — each session is
    emitted exactly once when the watermark passes its close, the
    production shape for live sessionization (state = open sessions
    only, bounded by active users x late-event allowance; batch
    re-sessionizes the world every run).

    Same rollup columns as the batch operator (exact fixed-point
    total_value); session_end reports the LAST EVENT's ts
    (session_window.end minus the gap), matching batch. No session_id:
    an append stream cannot number a user's sessions without total
    order over the unbounded past — consumers key on
    (user_id, session_start), which is unique. The oracle is the batch
    sessionize filtered by the same finalization predicate append mode
    applies (stream_hb_session's empirically-pinned boundary rules:
    exact-gap beats MERGE, session_end + gap == final watermark
    EMITS) — so this registers ORACLE-EXACT, not rows-only; the pytest
    additionally pins stream == filtered batch row-for-row."""
    from ..operators.analytics import s6, unscale
    from ..operators.sessions import SESSION_GAP_S

    spark = stream_clone(spark)  # session-local drain conf
    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir).select(
            "user_id", "ts", "event_type", "value"
        )
        sess = (
            ev.withWatermark("ts", SESSIONIZE_DELAY)
            .groupBy(
                "user_id",
                F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                    "n_purchases"
                ),
                F.sum(s6("value")).alias("tv_scaled"),
            )
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                (
                    F.col("w.end")
                    - F.expr(f"INTERVAL {SESSION_GAP_S} SECOND")
                ).alias("session_end"),
                "n_events",
                "n_purchases",
                unscale("tv_scaled", 6).alias("total_value"),
            )
        )
        return _run_to_memory(sess, "append")


OHLC_DELAY = "90 minutes"  # watermark: late-tick allowance

OHLC_STREAM_ORACLE = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
),
wc AS (
  SELECT event_type, hour_ts,
         max(CASE WHEN rn_a = 1 THEN value END) AS open,
         max(value) AS high,
         min(value) AS low,
         max(CASE WHEN rn_d = 1 THEN value END) AS close,
         count(*) AS n_events
  FROM ranked GROUP BY event_type, hour_ts
)
SELECT * FROM wc
WHERE hour_ts + INTERVAL 1 HOUR
      <= (SELECT max(ts) FROM events) - INTERVAL 90 MINUTE
"""


@query("stream_ohlc", oracle=OHLC_STREAM_ORACLE)
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ohlc_hourly live: watermarked tumbling-hour candlesticks over
    the tick stream, append mode — each finalized hour's
    open/high/low/close leaves state exactly once. State per open
    (window, type) cell is four scalars + the two (value, key) edge
    pairs min_by/max_by fold incrementally — O(windows-in-flight x
    #types), never O(ticks). The struct-keyed edges make duplicate
    timestamps deterministic in-stream exactly as in batch, so this
    registers ORACLE-EXACT: the oracle is the batch OHLC filtered by
    append's finalization predicate (window_end <= final watermark,
    stream_trending's empirically-pinned boundary)."""
    spark = stream_clone(spark)  # session-local drain conf
    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir).select(
            "ts", "event_id", "event_type", "value"
        )
        key = F.struct("ts", "event_id")
        ohlc = (
            ev.withWatermark("ts", OHLC_DELAY)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.min_by("value", key).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", key).alias("close"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                "event_type",
                F.col("w.start").alias("hour_ts"),
                "open",
                "high",
                "low",
                "close",
                "n_events",
            )
        )
        return _run_to_memory(ohlc, "append")


HOT_KEYS_K = 10  # hot keys reported

HOT_KEYS_ORACLE = f"""
SELECT user_id, n_events, rnk FROM (
  SELECT user_id, count(*) AS n_events,
         CAST(row_number() OVER (ORDER BY count(*) DESC, user_id)
              AS INTEGER) AS rnk
  FROM events GROUP BY user_id)
WHERE rnk <= {HOT_KEYS_K}
"""


@query("stream_hot_keys", oracle=HOT_KEYS_ORACLE)
def stream_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detection over the live event stream: per-user event
    counts maintained in-stream (complete mode — state is one counter
    per active key, the same bounded shape as stream_node_last_seen),
    top-{HOT_KEYS_K} ranked DOWNSTREAM of the drain over the
    users-sized aggregated rows, never the raw stream — the
    aggregate-in-stream / rank-downstream split stream_trending
    established. This is the operational signal the engine's own skew
    guards key off (salting, AQE skew-join): at 100 TB the same query
    watches shuffle-key distributions live and feeds the salting
    decision. ORACLE-EXACT: a complete-mode drain sees every event,
    so the counts equal the batch aggregate and the rank is the same
    deterministic (n DESC, user ASC) order in both engines."""
    spark = stream_clone(spark)  # session-local drain conf
    with nanos_as_long(spark):
        ev = events_stream(spark, sf_dir).select("user_id")
        counts = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events")
        )
        drained = _run_to_memory(counts, "complete")
    top = drained.orderBy(
        F.col("n_events").desc(), F.col("user_id")
    ).limit(HOT_KEYS_K)
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))
