"""Streaming-vs-batch parity (SURVEY.md §5.4, VERDICT r01 item 5).

Each Structured Streaming recast is driven to completion with
Trigger.AvailableNow and its final state compared against the batch
analog computed from the same fixture — asserting on outcomes, not
timing, per SURVEY §7. Covers the reference's standing loops:
HeartbeatMonitor (liveness state), session ends, and the
ChunkCorruptionMonitor alert fan-out.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

SESSION_GAP = datetime.timedelta(minutes=30)


def test_stream_last_seen_matches_batch(spark, registry):
    from cs686_big_data_p1_spark.views import heartbeats_df

    got = {
        (r.host, r.port, r.last_ts)
        for r in registry.QUERIES["stream_node_last_seen"](spark, SF_SMALL).collect()
    }
    want = {
        (r.host, r.port, r.last_ts)
        for r in heartbeats_df(spark, SF_SMALL)
        .groupBy("host", "port")
        .agg(F.max("ts").alias("last_ts"))
        .collect()
    }
    assert got == want


def test_stream_sessions_match_batch(spark, registry):
    """Append-mode session windows: every emitted session must exist in
    the batch hb_session result (session_end = last beat + gap), and the
    stream must emit nearly all of them — only sessions still open at
    the final watermark may be withheld."""
    stream_rows = registry.QUERIES["stream_hb_session"](spark, SF_SMALL).collect()
    batch_rows = registry.QUERIES["hb_session"](spark, SF_SMALL).collect()

    got = {
        (r.host, r.port, r.session_start, r.session_end, r.n_beats)
        for r in stream_rows
    }
    want = {
        (r.host, r.port, r.session_start, r.session_last + SESSION_GAP, r.n_beats)
        for r in batch_rows
    }
    assert got <= want
    assert len(got) >= 0.8 * len(want)
    # the withheld sessions must all touch the tail of the stream
    horizon = max(r.session_last for r in batch_rows) - datetime.timedelta(
        minutes=70
    )  # 40 min watermark + 30 min gap
    late = want - got
    assert all(end - SESSION_GAP >= horizon for (_, _, _, end, _) in late)


def test_stateful_liveness_matches_batch(spark, registry):
    """applyInPandasWithState per-node state after draining the stream
    must equal the batch per-node aggregation, and every node must be
    'alive' at its own horizon (the fixture stream ends with beats from
    all nodes within the 30 s age on the final batch's horizon) or
    'dead' consistently with the batch age computation."""
    from cs686_big_data_p1_spark.views import heartbeats_df

    rows = registry.QUERIES["stream_liveness_state"](spark, SF_SMALL).collect()
    got = {(r.host, r.port): (r.first_ts, r.last_ts, r.n_beats) for r in rows}
    want = {
        (r.host, r.port): (r.first_ts, r.last_ts, r.n_beats)
        for r in heartbeats_df(spark, SF_SMALL)
        .groupBy("host", "port")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_beats"),
        )
        .collect()
    }
    assert got == want
    assert all(r.status in ("alive", "dead") for r in rows)


def test_stream_corruption_alerts_match_batch(spark, registry):
    got = {
        (r.host, r.port, r.filename, r.sequence_no)
        for r in registry.QUERIES["stream_corruption_alerts"](
            spark, SF_SMALL
        ).collect()
    }
    want = {
        (r.host, r.port, r.filename, r.sequence_no)
        for r in registry.QUERIES["corruption_scan"](spark, SF_SMALL).collect()
    }
    assert got == want
