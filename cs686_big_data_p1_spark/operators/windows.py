"""Time-window operators over the heartbeat stream (SURVEY.md §2.F note).

The reference's periodic loops (heartbeat every 5 s, liveness check,
corruption scan) have no explicit windows; tumbling/sliding/session
windows are the idiomatic Spark expression of that periodic semantics,
so the engine ships them as first-class batch operators (the streaming
variants live in streaming/). Oracle checks reproduce each window
assignment in portable SQL (date_trunc buckets; gaps-and-islands for
sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..views import heartbeats_df, oracle

HB_TUMBLING_ORACLE = oracle(
    """
SELECT host, port, date_trunc('hour', ts) AS window_start,
       count(*) AS n_beats
FROM heartbeats
GROUP BY host, port, date_trunc('hour', ts)
"""
)


@query("hb_tumbling", oracle=HB_TUMBLING_ORACLE)
def hb_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour heartbeat counts per node.

    Uses Spark's window() (epoch-aligned, same boundaries as
    date_trunc for whole hours). Scale: group-by on (node, bucket) —
    partial agg collapses each partition to one row per node-hour."""
    hb = heartbeats_df(spark, sf_dir)
    return (
        hb.groupBy("host", "port", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_beats"))
        .select("host", "port", F.col("w.start").alias("window_start"), "n_beats")
    )


HB_SLIDING_ORACLE = oracle(
    """
SELECT host, port, window_start, count(*) AS n_beats
FROM (
  SELECT host, port,
         date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
         ts
  FROM heartbeats CROSS JOIN (VALUES (0), (1)) AS t(k)
)
GROUP BY host, port, window_start
"""
)


@query("hb_sliding", oracle=HB_SLIDING_ORACLE)
def hb_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour window, 1-hour slide: each heartbeat lands in two
    overlapping windows (Spark window(ts, '2 hours', '1 hour'))."""
    hb = heartbeats_df(spark, sf_dir)
    return (
        hb.groupBy("host", "port", F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_beats"))
        .select("host", "port", F.col("w.start").alias("window_start"), "n_beats")
    )


HB_SESSION_ORACLE = oracle(
    """
WITH flagged AS (
  SELECT host, port, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY host, port ORDER BY ts, hb_id)
                   IS NULL
                OR ts - lag(ts) OVER (PARTITION BY host, port ORDER BY ts, hb_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session,
         hb_id
  FROM heartbeats
),
sessions AS (
  SELECT host, port, ts,
         sum(new_session) OVER (PARTITION BY host, port ORDER BY ts, hb_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT host, port,
       min(ts) AS session_start,
       max(ts) AS session_last,
       count(*) AS n_beats
FROM sessions
GROUP BY host, port, session_id
"""
)


@query("hb_session", oracle=HB_SESSION_ORACLE)
def hb_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per node — the relational
    form of the reference's liveness sessions (a node's `session` ends
    when it goes silent; controller/HeartbeatMonitor.java:24-58).

    Spark session_window merges events <=30 min apart. The oracle
    reproduces it with lag + cumulative-sum (gaps and islands)."""
    hb = heartbeats_df(spark, sf_dir)
    return (
        hb.groupBy("host", "port", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_last"),
            F.count(F.lit(1)).alias("n_beats"),
        )
        .select("host", "port", "session_start", "session_last", "n_beats")
    )


HB_RATE_ORACLE = oracle(
    """
SELECT host, port, window_start, n_beats,
       n_beats - lag(n_beats) OVER (PARTITION BY host, port
                                    ORDER BY window_start) AS delta_beats,
       CAST(avg(n_beats) OVER (PARTITION BY host, port
                               ORDER BY window_start
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS moving_avg_3
FROM (
  SELECT host, port, date_trunc('hour', ts) AS window_start, count(*) AS n_beats
  FROM heartbeats GROUP BY 1, 2, 3
)
"""
)


@query("hb_rate", oracle=HB_RATE_ORACLE)
def hb_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows over the tumbling counts: lag delta + 3-bucket
    moving average per node — exercises frame-based aggregation
    (ROWS BETWEEN) and offset functions on top of a grouped agg."""
    base = hb_tumbling(spark, sf_dir)
    order = Window.partitionBy("host", "port").orderBy("window_start")
    frame = order.rowsBetween(-2, 0)
    return base.select(
        "host",
        "port",
        "window_start",
        "n_beats",
        (F.col("n_beats") - F.lag("n_beats").over(order)).alias("delta_beats"),
        F.avg("n_beats").over(frame).cast("double").alias("moving_avg_3"),
    )
