"""User-behavior analytics over the events stream: sessionization and
ordered-funnel conversion — the clickstream siblings of the node-level
session windows in operators/windows.py.

The reference has no clickstream layer; these extend its periodic/
liveness semantics (controller/HeartbeatMonitor.java:24-58 is the same
gaps-and-islands problem over node heartbeats) to the per-user event
stream the `events` fixture models.

Scale rules shared by both queries:
  * everything partitions on user_id — high-cardinality, no
    low-cardinality funnel key anywhere;
  * a pathological hot user (bot traffic) bounds at its own event
    count; the growth path is the same two-level (user, time-bucket)
    window sequence_pack/asof_join_bucketed already implement — shard
    the per-user window by contiguous time buckets and carry the
    running state across boundaries;
  * monetary sums ride the exact fixed-point idiom from
    operators/analytics.py (s6/unscale) so distributed fold order can
    never drift from the serial oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table
from .analytics import s6, unscale

SESSION_GAP_S = 30 * 60  # silence that closes a session

SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts, event_id, event_type, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS n_purchases,
       (CAST(sum(CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
             // 1000000 AS DOUBLE)
        + CAST(sum(CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
               % 1000000 AS DOUBLE) / 1000000.0) AS total_value
FROM islands
GROUP BY user_id, session_id
"""


@query("event_sessionize", oracle=SESSIONIZE_ORACLE)
def event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream sessionization: split each user's event stream into
    sessions at >30-minute silences (gaps-and-islands), rolling up
    per-session event count, purchase count, and exact monetary total.

    ONE shuffle: lag + running-sum + the final rollup all share the
    hashpartitioning(user_id) exchange (the groupBy adds the
    session_id key, which is a refinement of the window partitioning,
    so AQE coalesces rather than reshuffles). Gap arithmetic is in
    epoch MICROSECONDS (exact int64 in both engines) — a double
    seconds subtraction near epoch 1.7e9 only has ~0.1 us resolution
    left and could disagree with the oracle's interval compare on a
    boundary tie. Ties on ts break by event_id in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    new_sess = F.when(
        prev_us.isNull() | (us - prev_us > SESSION_GAP_S * 1_000_000), 1
    ).otherwise(0)
    islands = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int")
        .alias("session_id"),
    )
    return islands.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "n_purchases"
        ),
        F.sum(s6("value")).alias("tv_scaled"),
    ).select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        "n_events",
        "n_purchases",
        unscale("tv_scaled", 6).alias("total_value"),
    )


FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_after,
       (SELECT count(*) FROM p) AS n_purchased_after
"""


@query("event_funnel", oracle=FUNNEL_ORACLE)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered conversion funnel: users who viewed, then clicked
    strictly after their first view, then purchased strictly after that
    first qualifying click.

    The staged minimums (first view -> first click after it -> first
    purchase after that) are three conditional window aggregates over
    the SAME hashpartitioning(user_id) exchange — Catalyst stacks the
    Window operators on one shuffle, so the whole funnel is one
    exchange plus a map-side-combined global count (a 4-long row). The
    oracle builds the identical stages with self-joins — two different
    formulations, same fixpoint."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.select("user_id", "ts", "event_type").withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after"),
        F.count("t3").alias("n_purchased_after"),
    )


# --- Semi-structured event properties (JSON scalar-function surface) ----

PROPS_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM (SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
WHERE k IS NOT NULL
GROUP BY event_type
"""


@query("event_props_extract", oracle=PROPS_ORACLE)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction: events.props is a JSON
    string column ('{"k": N}'); pull the typed value out with
    get_json_object and aggregate it per event_type — the
    schema-on-read path every event pipeline needs for properties
    that never made it into typed columns.

    Scale: extraction is a JVM-side codegen projection (no Python, no
    shuffle); the aggregate is a map-side-combined groupBy on the
    low-cardinality event_type with all-integer states. Malformed or
    missing keys surface as NULL and are filtered identically in both
    engines (the filter sits before the agg, so rows with unparsable
    props never contribute). At 100 TB the same projection runs as a
    scan-local stage; if a property becomes hot enough to filter ON,
    it graduates to a typed column at ingest (schema evolution), not
    a faster JSON parser.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


# --- SCD2 state history (warehouse dimension-history surface) -----------

SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM ordered
),
hist AS (
  SELECT user_id, run_id, min(event_type) AS state,
         min(ts) AS valid_from, count(*) AS n_events
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       CAST(CASE WHEN lead(valid_from) OVER w2 IS NULL
                 THEN 1 ELSE 0 END AS INTEGER) AS is_current,
       n_events
FROM hist
WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
"""


@query("scd2_user_state", oracle=SCD2_ORACLE)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from a change log: each
    user's event stream collapses into [valid_from, valid_to) state
    intervals — consecutive same-type events merge into one run, a
    type change closes the old interval and opens a new one, the last
    interval per user is open-ended (is_current). The warehouse
    dimension-history pattern (Kimball SCD type 2) expressed as
    gaps-and-islands + lead.

    Determinism: run boundaries order by (ts, event_id) — the same
    event-stream tie-break event_sessionize pins — and a run's state
    is unique within the run by construction (min() is just the
    cross-engine-stable way to project it through the groupBy).

    Scale: both windows and the groupBy partition on user_id
    (high-cardinality); Catalyst reuses one Exchange for the run
    window and the rollup, and the interval table is runs-sized, not
    events-sized. Hot users bound at their own event count — the same
    (user, time-bucket) sharding sequence_pack uses is the escape
    hatch if one key becomes pathological."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    runs = e.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("run_id"),
    )
    hist = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    return hist.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.when(F.lead("valid_from").over(w2).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
        "n_events",
    )


RETENTION_ORACLE = """
WITH firstd AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
j AS (
  SELECT a.user_id,
         CAST(date_trunc('week', f.d0) AS TIMESTAMP) AS cohort_week,
         (a.d - f.d0) // 7 AS week_offset
  FROM act a JOIN firstd f ON a.user_id = f.user_id
)
SELECT cohort_week, CAST(week_offset AS INTEGER) AS week_offset,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_user_days
FROM j GROUP BY cohort_week, week_offset
"""


@query("retention_cohorts", oracle=RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users cohort by the ISO week of
    their first event; each later active day lands in a week offset
    ``(active_day - first_day) div 7``; the rollup counts distinct
    retained users and active user-days per (cohort_week, offset) —
    the standard product-analytics retention matrix.

    All arithmetic is exact: DATE subtraction is integer days in both
    engines, the offset floor-divides nonnegative ints, and both
    engines truncate weeks to Monday. No floats anywhere.

    Scale: first-day and active-day dedup both group on user_id
    (high-cardinality, one Exchange reused by the join via AQE); the
    final rollup's (cohort_week, offset) key is low-cardinality but
    arrives AFTER the per-user reduction — partial aggregation
    (map-side combine) collapses it before the tiny final shuffle, so
    there is no hot-key window anywhere."""
    e = load_table(spark, sf_dir, "events")
    firstd = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    act = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    j = act.join(firstd, "user_id").select(
        "user_id",
        # TIMESTAMP, not DATE (VERDICT r10 #8): Spark DateType reaches
        # pandas as object-dtype datetime.date while DuckDB DATE
        # renders datetime64 — equal values, divergent representation
        # for a type-sensitive hash (the dtype-contract class again).
        F.date_trunc("week", F.col("d0")).alias("cohort_week"),
        F.expr("datediff(d, d0) div 7").alias("week_offset"),
    )
    return j.groupBy("cohort_week", F.col("week_offset").cast("int").alias("week_offset")).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_user_days"),
    )


DEBOUNCE_GAP_S = 5 * 60  # min silence between same-type events kept

DEBOUNCE_ORACLE = f"""
SELECT user_id, event_type, ts, event_id
FROM (
  SELECT user_id, event_type, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)
WHERE prev_ts IS NULL
   OR epoch_us(ts) - epoch_us(prev_ts) > {DEBOUNCE_GAP_S} * 1000000
"""


@query("event_debounce", oracle=DEBOUNCE_ORACLE)
def event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream debounce: drop a (user, event_type) occurrence if
    the PREVIOUS occurrence is within {DEBOUNCE_GAP_S} s — the rapid-
    fire / double-click cleaning pass run before sessionization or
    billing. Gap arithmetic is exact integer microseconds with the
    event_id tie-break (the event_sessionize contract), so boundary
    events cannot flap between engines.

    Note the relaxation this variant DEFINES (and the oracle mirrors):
    the gap is measured to the previous RAW event, not the previous
    KEPT one — pure lag, one window, one shuffle on the
    high-cardinality (user_id, event_type) key. The kept-anchor
    variant is a gaps-and-islands run over the same partitioning
    (event_sessionize's shape) at identical scale cost."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    return (
        e.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            prev_us.alias("p_us"),
            us.alias("c_us"),
        )
        .where(
            F.col("p_us").isNull()
            | (F.col("c_us") - F.col("p_us") > DEBOUNCE_GAP_S * 1_000_000)
        )
        .select("user_id", "event_type", "ts", "event_id")
    )


THROTTLE_GAP_S = 5 * 60

_THROTTLE_SCHEMA = (
    "user_id long, event_type string, ts timestamp, event_id long"
)


def _throttle_partition(batches):
    """Kept-anchor scan over one hash partition of (user, type)
    groups, arriving sorted by (user_id, event_type, ts, event_id).

    Why mapInPandas and not applyInPandas: the fixture has ~5 events
    per (user, type) group, so per-GROUP pandas plumbing (one Python
    call + frame per group) costs ~50 us x #groups and dominated the
    first implementation (18.5 s at sf0.1). Here a partition's groups
    are delimited VECTORIZED (one np.flatnonzero over the sorted
    keys), and each group runs an O(#kept) searchsorted JUMP scan —
    the anchor moves straight to the next survivor instead of
    visiting every dropped row. Memory: one partition concatenated in
    pandas — bounded by shuffle-partition sizing, the same envelope
    every Arrow exchange in this engine assumes."""
    import numpy as np
    import pandas as pd

    gap_us = THROTTLE_GAP_S * 1_000_000
    pdfs = [p for p in batches if len(p)]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True)
    ts_us = pdf["ts"].values.astype("datetime64[us]").astype(np.int64)
    uid = pdf["user_id"].values
    et, _ = pd.factorize(pdf["event_type"])
    # group boundary wherever either key changes (input is sorted)
    change = np.flatnonzero((np.diff(uid) != 0) | (np.diff(et) != 0)) + 1
    starts = np.concatenate(([0], change, [len(pdf)]))
    keep = np.zeros(len(pdf), dtype=bool)
    for s, e in zip(starts[:-1], starts[1:]):
        seg = ts_us[s:e]
        i = 0
        while i < len(seg):
            keep[s + i] = True
            # jump to the first row past the kept anchor's window
            i = np.searchsorted(seg, seg[i] + gap_us, side="right")
    yield pdf.loc[keep, ["user_id", "event_type", "ts", "event_id"]]


# The kept-anchor recurrence IS SQL-expressible after all — as a
# recursive CTE (the corpus_curate closure precedent): the working
# table holds each (user, type) group's CURRENT anchor; one iteration
# advances every group to its next kept row = the (ts, event_id)-min
# event strictly more than the gap after the anchor. Iterations =
# max kept-per-group; each is one hash join (events x one-anchor-per-
# group) + a per-group argmin window. Strict `>` mirrors the
# recurrence's `t_us - last_us > gap_us`.
THROTTLE_ORACLE = f"""
WITH RECURSIVE kept AS (
  (SELECT user_id, event_type, ts, event_id FROM (
     SELECT user_id, event_type, ts, event_id,
            row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
     FROM events) WHERE rn = 1)
  UNION ALL
  SELECT user_id, event_type, ts, event_id FROM (
    SELECT e.user_id, e.event_type, e.ts, e.event_id,
           row_number() OVER (PARTITION BY e.user_id, e.event_type
                              ORDER BY e.ts, e.event_id) AS rn
    FROM events e JOIN kept k
      ON e.user_id = k.user_id AND e.event_type = k.event_type
     AND e.ts > k.ts + INTERVAL {THROTTLE_GAP_S} SECOND
  ) WHERE rn = 1
)
SELECT user_id, event_type, ts, event_id FROM kept
"""


@query("event_throttle", oracle=THROTTLE_ORACLE)
def event_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEPT-ANCHOR throttle (rate limiting): within each (user,
    event_type) stream, keep an event iff it is > {THROTTLE_GAP_S} s
    after the last KEPT event — the billing/notification rate-limit
    semantic. Unlike event_debounce's previous-RAW-event gap, the
    anchor only advances on keeps, so the decision for row i depends
    on the keep decisions before it: a sequential recurrence no window
    function expresses — the case SURVEY.md §4.3 reserves for the
    Arrow path (per-group sequential logic, JVM everywhere else).

    Scale: ONE hash shuffle on the high-cardinality (user_id,
    event_type) key with an in-partition sort, then mapInPandas scans
    each partition's groups in numpy (vectorized group delimiting +
    O(#kept) searchsorted jumps — see _throttle_partition for why
    per-group applyInPandas was 10x slower on small groups). A hot
    user bounds at its own event count (the sequence_pack
    (key, time-bucket) sharding applies if one key degenerates, at
    the cost of approximate anchors at shard edges). ORACLE-EXACT
    since r9 via the recursive-CTE anchor walk (THROTTLE_ORACLE);
    tests/test_search_graph.py additionally pins it against an
    independent pure-Python recompute and the consecutive-gap
    invariant."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("user_id", "event_type", "ts", "event_id")
        .repartition("user_id", "event_type")
        .sortWithinPartitions("user_id", "event_type", "ts", "event_id")
        .mapInPandas(_throttle_partition, _THROTTLE_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Peak concurrency (sweep line over session intervals)
# ---------------------------------------------------------------------------

def _session_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line deltas from the session list: +1 at each start, -1 at
    each end, tagged with the event's calendar day — the shared input
    of max_concurrency and coverage_time."""
    sess = event_sessionize(spark, sf_dir)
    starts = sess.select(
        F.col("session_start").alias("ts"),
        F.lit(1).alias("delta"),
        F.date_trunc("day", "session_start").alias("day"),
    )
    ends = sess.select(
        F.col("session_end").alias("ts"),
        F.lit(-1).alias("delta"),
        F.date_trunc("day", "session_end").alias("day"),
    )
    return starts.unionAll(ends)


def _calendar_offsets(deltas: DataFrame, *extra_aggs) -> DataFrame:
    """Full-calendar per-day summary with cumulative carry-in — the
    densify core both sweep-line queries share (review r8: previously
    duplicated verbatim). Every day between the first and last delta
    day appears (F.sequence explode — bounded, O(#days));
    `day_total` is 0 on deltaless days; `carry_in` is the cumulative
    sum of prior days' totals (the only unpartitioned window, over the
    bounded day list). extra_aggs (e.g. min/max ts) ride the same
    groupBy and stay NULL on deltaless days for the caller to
    coalesce."""
    cal = deltas.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    day_order = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    daytot = deltas.groupBy("day").agg(
        F.sum("delta").alias("day_total"), *extra_aggs
    )
    return (
        cal.join(daytot, "day", "left")
        .na.fill({"day_total": 0})
        .withColumn(
            "carry_in",
            F.sum("day_total").over(day_order) - F.col("day_total"),
        )
    )


MAX_CONCURRENCY_ORACLE = f"""
WITH sess AS ({SESSIONIZE_ORACLE}),
deltas AS (
  SELECT session_start AS ts, 1 AS delta,
         date_trunc('day', session_start) AS day
  FROM sess
  UNION ALL
  SELECT session_end, -1, date_trunc('day', session_end) FROM sess
),
daytot AS (SELECT day, sum(delta) AS day_total FROM deltas GROUP BY day),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM deltas),
cal AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
),
offs AS (
  SELECT c.day,
         sum(COALESCE(t.day_total, 0)) OVER (ORDER BY c.day
                                             ROWS UNBOUNDED PRECEDING)
             - COALESCE(t.day_total, 0) AS carry_in
  FROM cal c LEFT JOIN daytot t ON t.day = c.day
),
running AS (
  SELECT day, ts, delta,
         sum(delta) OVER (ORDER BY ts, delta DESC, day
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas
),
inner_max AS (SELECT day, max(conc) AS mx FROM running GROUP BY day)
SELECT o.day,
       CAST(greatest(o.carry_in, COALESCE(i.mx, o.carry_in)) AS INT)
           AS peak_concurrency
FROM offs o LEFT JOIN inner_max i ON i.day = o.day
"""


@query("max_concurrency", oracle=MAX_CONCURRENCY_ORACLE)
def max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-active sessions per day — the
    classic interval sweep line: +1 at each session_start, -1 at each
    session_end (inclusive ends: +1 sorts before -1 at the same
    instant), running sum, max per day.

    The oracle expresses the running sum as ONE global window — the
    shape that cannot scale (a single total-order sort partition).
    The engine computes the identical prefix sums SHARDED: each day's
    deltas get an in-day running sum under a day-partitioned window,
    day totals roll up to a bounded aggregate (O(#days) rows) whose
    own cumulative sum — the carry-in concurrency from all prior days
    — is a single-partition window over that tiny aggregate only,
    broadcast back onto the in-day sums. This is the two-phase
    distributed prefix-sum (scan) pattern: the only total-order work
    happens on #days rows, never on the event stream.

    Order-insensitivity at ties: within one (ts, delta) group the
    prefix values are a fixed arithmetic run regardless of row
    permutation, and all +1s sort before any -1 at the same ts in
    both engines, so per-day maxima are deterministic cross-engine
    even though neither engine's sort is stable.

    Sessions spanning midnight need no special case: their +1 lives
    in an earlier day's total and reaches later days through the
    carry-in offset. The output is DENSIFIED over the full calendar
    between the first and last delta day (ADVICE r6/r7: a day fully
    inside a spanning session used to emit no row, indistinguishable
    from zero activity): deltaless days report their carry-in
    concurrency, and midnight itself counts as a sweep point, so a
    day whose only deltas are session ends still reports the
    concurrency it woke up with. The calendar is O(#days) — same
    bounded row set the carry-in window already rides.
    """
    deltas = _session_deltas(spark, sf_dir)
    in_day = Window.partitionBy("day").orderBy(
        F.col("ts"), F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    day_running = deltas.withColumn("run", F.sum("delta").over(in_day))
    offsets = _calendar_offsets(deltas).select("day", "carry_in")
    # aggregate the in-day maxima BEFORE touching offsets (carry_in is
    # constant per day, so max(run + carry) = carry + max(run)): offsets
    # — and its bounded cumulative window — appears exactly ONCE in the
    # plan, and the delta stream never joins the offset table at all
    inner = day_running.groupBy("day").agg(F.max("run").alias("mx_run"))
    return offsets.join(F.broadcast(inner), "day", "left").select(
        "day",
        F.greatest(
            F.col("carry_in"),
            F.coalesce(
                F.col("carry_in") + F.col("mx_run"), F.col("carry_in")
            ),
        )
        .cast("int")
        .alias("peak_concurrency"),
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov over user streams)
# ---------------------------------------------------------------------------

TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
t AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
f AS (SELECT from_type, sum(n) AS n_from FROM t GROUP BY from_type)
SELECT t.from_type, t.to_type, t.n,
       CAST(t.n AS DOUBLE) / f.n_from AS p
FROM t JOIN f ON t.from_type = f.from_type
"""


@query("event_transitions", oracle=TRANSITIONS_ORACLE)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: counts and conditional probabilities of event_type ->
    next event_type (ties on ts broken by event_id, the engine-wide
    sequencing rule) — the navigation-pattern / next-action summary
    every product-analytics stack derives.

    Scale: ONE user_id-partitioned lead window (high-cardinality
    key), then a groupBy onto at most #types^2 cells — map-side
    combine collapses each partition to the tiny matrix before the
    exchange, and the row-sum normalizer joins on a #types-row
    aggregate. p is one exact-int division, identical IEEE op in
    both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    t = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f = t.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return t.join(F.broadcast(f), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("n_from")).alias("p"),
    )


SESSION_ASSIGN_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {SESSION_GAP_S} * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, ts,
       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS INTEGER)
           AS session_id
FROM flagged
"""


@query("event_session_assign", oracle=SESSION_ASSIGN_ORACLE)
def event_session_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session labels — event_sessionize's enrichment
    output: every event carries its (user, session) id so downstream
    joins (throttling, attribution, funnels) can key on the session
    without re-deriving the gaps-and-islands. Same one-shuffle
    user_id window as the rollup; identical tie-break (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    new_sess = F.when(
        prev_us.isNull() | (us - prev_us > SESSION_GAP_S * 1_000_000), 1
    ).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int")
        .alias("session_id"),
    )


ATTRIBUTION_CREDIT_ORACLE = """
WITH touches AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.value AS purchase_value,
         v.event_id AS view_id, v.ts AS view_ts,
         count(*) OVER (PARTITION BY p.event_id) AS n_touches,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY v.ts DESC, v.event_id DESC) AS recency
  FROM events p JOIN events v
    ON v.user_id = p.user_id
   AND p.event_type = 'purchase' AND v.event_type = 'view'
   AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
)
SELECT purchase_id, view_id, user_id, n_touches,
       CAST(CASE WHEN recency = 1 THEN 1 ELSE 0 END AS DOUBLE)
           AS last_touch_credit,
       1.0 / n_touches AS linear_credit
FROM touches
"""


@query("attribution_credit", oracle=ATTRIBUTION_CREDIT_ORACLE)
def attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution over the purchase<-view range join
    (stream_attribution's batch shape): each (purchase, view) touch
    gets LAST-TOUCH credit (1.0 to the most recent view, event_id
    tie-break) and LINEAR credit (1/n_touches) — the two models every
    marketing stack reports side by side. Credits are exact: the
    indicator is integer, and 1/n is a single IEEE division both
    engines share.

    Scale: the range join shuffles on user_id (the stream sibling's
    state-bounding key); the per-purchase window partitions on
    purchase event_id — high-cardinality, bounded by views-per-hour
    per user. No extra scan: counts and recency ranks come from the
    same window pass."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    touches = p.join(
        v,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("p_ts"))
        & (F.col("view_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    wp = Window.partitionBy("purchase_id")
    wr = wp.orderBy(F.desc("view_ts"), F.desc("view_id"))
    return touches.select(
        "purchase_id",
        "view_id",
        "user_id",
        F.count(F.lit(1)).over(wp).alias("n_touches"),
        F.row_number().over(wr).alias("recency"),
    ).select(
        "purchase_id",
        "view_id",
        "user_id",
        "n_touches",
        F.when(F.col("recency") == 1, 1.0).otherwise(0.0).alias(
            "last_touch_credit"
        ),
        (F.lit(1.0) / F.col("n_touches")).alias("linear_credit"),
    )


# ---------------------------------------------------------------------------
# Interval-union coverage time (sweep line, part 2)
# ---------------------------------------------------------------------------

COVERAGE_TIME_ORACLE = f"""
WITH sess AS ({SESSIONIZE_ORACLE}),
deltas AS (
  SELECT session_start AS ts, 1 AS delta,
         date_trunc('day', session_start) AS day
  FROM sess
  UNION ALL
  SELECT session_end, -1, date_trunc('day', session_end) FROM sess
),
daytot AS (
  SELECT day, sum(delta) AS day_total,
         min(ts) AS first_ts, max(ts) AS last_ts
  FROM deltas GROUP BY day
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM deltas),
cal AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
),
offs AS (
  SELECT c.day,
         COALESCE(t.first_ts, c.day + INTERVAL 1 DAY) AS first_ts,
         COALESCE(t.last_ts, c.day + INTERVAL 1 DAY) AS last_ts,
         COALESCE(t.day_total, 0) AS day_total,
         sum(COALESCE(t.day_total, 0)) OVER (ORDER BY c.day
                                             ROWS UNBOUNDED PRECEDING)
             - COALESCE(t.day_total, 0) AS carry_in
  FROM cal c LEFT JOIN daytot t ON t.day = c.day
),
running AS (
  SELECT day, ts,
         sum(delta) OVER (ORDER BY ts, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS conc,
         lead(ts) OVER (PARTITION BY day ORDER BY ts, delta DESC)
             AS next_ts
  FROM deltas
),
inner_cov AS (
  SELECT day,
         sum(CASE WHEN conc > 0 AND next_ts IS NOT NULL
                  THEN epoch_us(next_ts) - epoch_us(ts) ELSE 0 END) AS cov_us
  FROM running GROUP BY day
)
SELECT o.day,
       CAST(COALESCE(i.cov_us, 0)
            + CASE WHEN o.carry_in > 0
                   THEN epoch_us(o.first_ts) - epoch_us(o.day)
                   ELSE 0 END
            + CASE WHEN o.carry_in + o.day_total > 0
                   THEN epoch_us(o.day + INTERVAL 1 DAY) - epoch_us(o.last_ts)
                   ELSE 0 END AS BIGINT) AS covered_us
FROM offs o LEFT JOIN inner_cov i ON i.day = o.day
"""


@query("coverage_time", oracle=COVERAGE_TIME_ORACLE)
def coverage_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION length per day: microseconds during which at
    least one user session was active — the SLA/uptime accounting
    classic (max_concurrency asks "how many at once"; this asks "for
    how long at all"), robust to arbitrarily overlapping sessions
    because it sums sweep-line segments where concurrency > 0 rather
    than session durations.

    Same sharded two-phase scan as max_concurrency: in-day running
    concurrency + an O(#days) per-day summary (totals, first/last
    delta, cumulative carry-in). Interior segments credit
    (ts -> next_ts) spans with positive concurrency; the day's
    OPENING span (midnight -> first delta) is credited iff sessions
    carried in overnight (carry_in > 0) and the CLOSING span (last
    delta -> midnight) iff the day ends with open sessions
    (carry_in + day_total > 0) — both read from the deterministic
    per-day summary, never from a boundary row's own running sum,
    because rows tied on (ts, delta) make "the first row's prefix"
    permutation-dependent across engines. Interior spans are safe:
    only the physically-last row of a tied group carries a next_ts
    beyond the tie, and its prefix is the full post-group concurrency
    under any permutation. The output is DENSIFIED over the full
    calendar between the first and last delta day (ADVICE r6/r7): a
    deltaless day inside a spanning session reports the full 86400 s
    (its first_ts/last_ts coalesce to the next midnight, so the
    opening-credit arm covers the whole day when carry_in > 0), and a
    deltaless idle day reports 0. All arithmetic is exact
    epoch-microsecond int64.
    """
    deltas = _session_deltas(spark, sf_dir)
    in_day = Window.partitionBy("day").orderBy(
        F.col("ts"), F.col("delta").desc()
    )
    run_f = in_day.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_midnight = F.col("day") + F.expr("INTERVAL 1 DAY")
    offs = _calendar_offsets(
        deltas,
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ).select(
        "day",
        "day_total",
        "carry_in",
        F.coalesce("first_ts", next_midnight).alias("first_ts"),
        F.coalesce("last_ts", next_midnight).alias("last_ts"),
    )
    r = (
        deltas.withColumn("run_in_day", F.sum("delta").over(run_f))
        .withColumn("next_ts", F.lead("ts").over(in_day))
        .join(F.broadcast(offs.select("day", "carry_in")), "day")
        .withColumn("conc", F.col("run_in_day") + F.col("carry_in"))
    )
    inner = r.groupBy("day").agg(
        F.sum(
            F.when(
                (F.col("conc") > 0) & F.col("next_ts").isNotNull(),
                F.unix_micros("next_ts") - F.unix_micros("ts"),
            ).otherwise(F.lit(0))
        ).alias("cov_us")
    )
    return offs.join(F.broadcast(inner), "day", "left").select(
        "day",
        (
            F.coalesce("cov_us", F.lit(0))
            + F.when(
                F.col("carry_in") > 0,
                F.unix_micros("first_ts") - F.unix_micros("day"),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("carry_in") + F.col("day_total") > 0,
                F.unix_micros(next_midnight)
                - F.unix_micros("last_ts"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("covered_us"),
    )
