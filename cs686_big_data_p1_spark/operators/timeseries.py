"""Time-series resampling over the events stream table.

Regular-grid resampling + gap filling — the preprocessing step between
raw event logs and any windowed model input (rates, features,
anomaly scores). The pipeline: bucket events to the hour, keep the
last observation per bucket, expand each series to a dense hourly
grid, forward-fill the holes.

Cross-engine exactness: values are copied, never combined — the
forward fill propagates an existing double unchanged, so the oracle
hash-compares exactly with zero float arithmetic.

Scale notes (100 TB):

  * Everything partitions by user_id (150 in the fixture, millions in
    production — high-cardinality, no hot reducer). The per-bucket
    "last observation" is a bounded row_number window; the forward
    fill is one running window per series.
  * The grid explode is sequence() per user — output rows scale with
    (span hours x users), generated JVM-side, no shuffle of raw
    events beyond the per-user repartition the windows already need.
  * All five stages share the user_id partitioning, so Catalyst
    reuses one Exchange across the bucket window, the grid join, and
    the fill window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table


GAPFILL_ORACLE = """
WITH obs AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts, value,
         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
hourly AS (
  SELECT user_id, hour_ts, value, 1 AS observed FROM obs WHERE rn = 1
),
bounds AS (
  SELECT user_id, min(hour_ts) AS h0, max(hour_ts) AS h1
  FROM hourly GROUP BY user_id
),
grid AS (
  SELECT user_id,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds
)
SELECT g.user_id, g.hour_ts,
       last_value(h.value IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.hour_ts
                 ROWS UNBOUNDED PRECEDING) AS value_ff,
       coalesce(h.observed, 0) AS is_observed
FROM grid g
LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour_ts = h.hour_ts
"""


@query("gapfill_ffill", oracle=GAPFILL_ORACLE)
def gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of each user's event series with forward fill:
    last observation per (user, hour), dense hourly grid from the
    user's first to last active hour, holes carry the previous value.

    Scale: see module docstring. The observed flag lets downstream
    consumers distinguish real points from carried ones.
    """
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    w_last = Window.partitionBy("user_id", "hour_ts").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly = (
        e.select("user_id", hour.alias("hour_ts"), "ts", "event_id", "value")
        .withColumn("_rn", F.row_number().over(w_last))
        .where(F.col("_rn") == 1)
        .select("user_id", "hour_ts", "value", F.lit(1).alias("observed"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour_ts").alias("h0"), F.max("hour_ts").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(
        hourly.select("user_id", "hour_ts", "value", "observed"),
        ["user_id", "hour_ts"],
        "left",
    )
    return joined.select(
        "user_id",
        "hour_ts",
        F.last("value", ignorenulls=True).over(w_fill).alias("value_ff"),
        F.coalesce(F.col("observed"), F.lit(0)).alias("is_observed"),
    )


ROLL_W = 5  # trailing window width (rows)

ROLLING_ORACLE = f"""
SELECT user_id, event_id, ts,
       (CAST((sum(CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
              OVER w) // 1000000 AS DOUBLE)
        + CAST((sum(CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
                OVER w) % 1000000 AS DOUBLE) / 1000000.0) AS roll_sum,
       (CAST((sum(CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
              OVER w) // 1000000 AS DOUBLE)
        + CAST((sum(CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
                OVER w) % 1000000 AS DOUBLE) / 1000000.0)
           / (count(*) OVER w) AS roll_avg,
       CAST(count(*) OVER w AS BIGINT) AS roll_n,
       value - lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLL_W - 1} PRECEDING AND CURRENT ROW)
"""


@query("rolling_stats", oracle=ROLLING_ORACLE)
def rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window features per event — {ROLL_W}-row rolling
    sum/avg of `value` and the first difference vs the previous event
    — the feature-engineering pass between a raw event log and any
    sequence model input.

    Cross-engine exactness: the rolling sum accumulates 1e6-scaled
    exact integers (decimal/HUGEINT) inside the frame and converts
    once via the quotient/remainder split (operators/analytics.py
    policy), so float addition order cannot drift between engines;
    the avg divides that one double by the frame row count; delta
    subtracts two raw doubles (exact per IEEE). Frames order by
    (ts, event_id) — the repo-wide duplicate-ts tie-break.

    Precondition (unscale contract, operators/analytics.py): event
    values are nonnegative (fixture min 0.01), so every rolling sum
    is nonnegative and the div/pmod vs // and %% split agrees across
    engines. A signed-value deployment would offset or split the
    column first.

    Scale: one shuffle on user_id (high-cardinality — no hot
    reducer); both windows and the lag share that partitioning, so
    Catalyst plans a single Exchange + one sort; the frame is
    ROWS-bounded ({ROLL_W} rows of state per series, never
    unbounded)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLL_W - 1), 0)
    )
    lw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s6v = (F.col("value").cast("decimal(12,6)") * 1_000_000).cast(
        "decimal(38,0)"
    )
    rsum = F.sum(s6v).over(w)
    unscaled = F.expr(
        "CAST(_rs div 1000000 AS DOUBLE) "
        "+ CAST(CAST(pmod(_rs, 1000000) AS BIGINT) AS DOUBLE) / 1000000.0"
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            rsum.alias("_rs"),
            F.count(F.lit(1)).over(w).alias("roll_n"),
            F.lag("value").over(lw).alias("_prev"),
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            unscaled.alias("roll_sum"),
            (unscaled / F.col("roll_n")).alias("roll_avg"),
            F.col("roll_n").cast("bigint").alias("roll_n"),
            (F.col("value") - F.col("_prev")).alias("delta"),
        )
    )


QUANTILES_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       avg(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2)
                THEN value END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                THEN value END) AS p90,
       CAST(max(n) AS BIGINT) AS n
FROM ranked GROUP BY event_type
"""


@query("event_value_quantiles", oracle=QUANTILES_ORACLE)
def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (median + p90 of value per
    event_type) via rank arithmetic — price_median's engine-
    independent technique generalized to grouped quantiles, where
    percentile built-ins differ across engines (interpolation
    schemes) and approx sketches differ run to run.

    Determinism: the selected VALUE at a rank position is invariant
    to tie order among equal values; the even-n median averages two
    doubles with the identical sum/count expression in both engines;
    ceil(0.9 * n) is the same IEEE expression on both sides.

    Scale: one shuffle on event_type for the ranking window (5 groups
    in the fixture — production would range-partition within group or
    two-phase via partial histograms; the window itself is the
    textbook exact-quantile shape), then a map-side CASE aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    wc = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.avg(
            F.when(
                (F.col("rn") == F.expr("(n + 1) div 2"))
                | (F.col("rn") == F.expr("(n + 2) div 2")),
                F.col("value"),
            )
        ).alias("p50"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.9) * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("p90"),
        F.max("n").cast("bigint").alias("n"),
    )


ZSCORE_MIN_N = 5  # a z-score over fewer observations is noise

_S6V = "CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT)"
_SUM1 = f"sum({_S6V})"  # 1e6-scaled exact first moment
_SUM2 = f"sum({_S6V} * {_S6V})"  # 1e12-scaled exact second moment

ANOMALY_ORACLE = f"""
WITH stats AS (
  SELECT user_id,
         count(*) AS n,
         (CAST(({_SUM1}) // 1000000 AS DOUBLE)
          + CAST(({_SUM1}) % 1000000 AS DOUBLE) / 1000000.0) AS s1,
         (CAST(({_SUM2}) // 1000000000000 AS DOUBLE)
          + CAST(({_SUM2}) % 1000000000000 AS DOUBLE) / 1000000000000.0)
             AS s2
  FROM events GROUP BY user_id
)
SELECT e.user_id, e.event_id, e.ts, e.value,
       (e.value - s.s1 / s.n)
           / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n)) AS zscore
FROM events e JOIN stats s ON e.user_id = s.user_id
WHERE s.n >= {ZSCORE_MIN_N}
  AND s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n) > 0
  AND abs((e.value - s.s1 / s.n)
          / sqrt(s.s2 / s.n - (s.s1 / s.n) * (s.s1 / s.n))) >= 2.0
"""


@query("anomaly_zscore", oracle=ANOMALY_ORACLE)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flags: events whose value deviates
    >= 2 sigma from the user's own distribution — the outlier pass a
    telemetry/curation pipeline runs before training on event data.

    Cross-engine exactness: mean and population variance derive from
    EXACT scaled integer first/second moments (1e6- and 1e12-scaled
    HUGEINT/decimal sums, converted once via the quotient/remainder
    split), so both engines evaluate the identical IEEE expression
    tree for mean, variance, sqrt, and the z ratio — no accumulation-
    order drift. Zero-variance and short series are excluded in both
    engines (same predicate).

    Scale: one groupBy on user_id (map-side partial moments) joined
    back to the events — the stats side is one row per user; at
    production user counts the join shuffles both sides on user_id,
    the same key every other per-user stage already uses.
    """
    e = load_table(spark, sf_dir, "events")
    s6v = (F.col("value").cast("decimal(12,6)") * 1_000_000).cast(
        "decimal(38,0)"
    )
    stats = (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s6v).alias("_s1"),
            F.sum(s6v * s6v).alias("_s2"),
        )
        .select(
            "user_id",
            "n",
            F.expr(
                "CAST(_s1 div 1000000 AS DOUBLE) "
                "+ CAST(CAST(pmod(_s1, 1000000) AS BIGINT) AS DOUBLE) "
                "/ 1000000.0"
            ).alias("s1"),
            F.expr(
                "CAST(_s2 div 1000000000000 AS DOUBLE) "
                "+ CAST(CAST(pmod(_s2, 1000000000000) AS BIGINT) AS DOUBLE) "
                "/ 1000000000000.0"
            ).alias("s2"),
        )
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        e.select("user_id", "event_id", "ts", "value")
        .join(stats, "user_id")
        .where(
            (F.col("n") >= ZSCORE_MIN_N) & (var > 0) & (F.abs(z) >= 2.0)
        )
        .select("user_id", "event_id", "ts", "value", z.alias("zscore"))
    )


@query("approx_quantiles")
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based per-group quantiles: percentile_approx (the
    Greenwald-Khanna mergeable sketch built into Spark) for the same
    (p50, p90) event_value_quantiles computes exactly. Rows-only by
    design — the sketch's answer is implementation-defined, so no
    cross-engine oracle can hash-match it; tests/test_er_timeseries.py
    pins it within the sketch's rank-error tolerance of the exact
    rank-arithmetic answers and pins determinism (the sketch is
    deterministic for a given dataset, merge order included).

    Scale: this is the 100 TB path where the exact window's full sort
    per group is not worth it — the sketch is O(1/eps) state per
    group, built map-side and merged associatively, one narrow shuffle
    of sketch state instead of a full-width sort exchange. The exact
    variant stays as the small-SF correctness anchor.
    """
    e = load_table(spark, sf_dir, "events")
    acc = 10000  # 1/eps: rank error <= n/acc
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, acc).alias("p50"),
        F.percentile_approx("value", 0.9, acc).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------

CUSUM_H = 200  # drift threshold, in value units


CUSUM_ORACLE = f"""
WITH s AS (
  SELECT user_id, ts, event_id,
         sum(CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sk,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS k,
         sum(CAST(CAST(value AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
           OVER (PARTITION BY user_id) AS t,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
d AS (SELECT *, n * sk - k * t AS dev FROM s)
SELECT user_id, ts, event_id, CAST(k AS INTEGER) AS k,
       CAST(CASE WHEN dev > 0 THEN 1 ELSE -1 END AS INTEGER) AS direction,
       (CAST(abs(dev) // 1000000 AS DOUBLE)
        + CAST(abs(dev) % 1000000 AS DOUBLE) / 1000000.0) / n AS cusum_dev
FROM d
WHERE abs(dev) > {CUSUM_H} * n * 1000000
"""


@query("cusum_changepoints", oracle=CUSUM_ORACLE)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per user: flag event positions where the
    cumulative deviation from the user's mean value exceeds
    {CUSUM_H} value units — the classic changepoint statistic
    (Page 1954) over each user's event-value series, the "did this
    user's spending level shift" signal anomaly_zscore's pointwise
    test cannot see (a run of individually-unremarkable values drifts
    the cumulative sum far from zero).

    The statistic CUSUM_k = S_k - k*mean is a RATIO-free exact test:
    cross-multiplying by n turns it into |n*S_k - k*T| > h*n (all
    1e6-scaled decimal/HUGEINT integers — S_k the running sum, T the
    user total), so the flag boundary cannot drift between engines.
    The reported magnitude divides the exact |dev| back to value
    units via the quotient/remainder split (nonnegative by
    construction) and one shared double division.

    Scale: ONE user_id-partitioned window pass computes the running
    sum, the rank, and the per-user totals together (user_id is
    high-cardinality; per-user series are bounded) — no join, no
    second shuffle, no driver step.
    """
    v6 = (F.col("value").cast("decimal(12,6)") * 1_000_000).cast(
        "decimal(38,0)"
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    s = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.sum(v6)
            .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("sk"),
            F.row_number().over(wo).cast("long").alias("k"),
            F.sum(v6).over(wall).alias("t"),
            F.count(F.lit(1)).over(wall).alias("n"),
        )
        .withColumn("dev", F.col("n") * F.col("sk") - F.col("k") * F.col("t"))
        .withColumn("adev", F.abs(F.col("dev")))
    )
    unscaled = F.expr(
        "CAST(adev div 1000000 AS DOUBLE)"
        " + CAST(CAST(pmod(adev, 1000000) AS BIGINT) AS DOUBLE) / 1000000.0"
    )
    return s.where(
        F.col("adev")
        > F.lit(CUSUM_H) * F.col("n") * F.lit(1_000_000).cast("decimal(38,0)")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.col("k").cast("int").alias("k"),
        F.when(F.col("dev") > 0, 1).otherwise(-1).cast("int").alias("direction"),
        (unscaled / F.col("n")).alias("cusum_dev"),
    )


# --- OHLC downsampling (candlestick resample) ----------------------------

OHLC_ORACLE = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, hour_ts,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n_events
FROM ranked
GROUP BY event_type, hour_ts
"""


@query("ohlc_hourly", oracle=OHLC_ORACLE)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick (OHLC) downsampling per (event_type, hour): open =
    first value, close = last value in (ts, event_id) order, high/low
    = extrema, n = bucket count — the financial/metrics resample every
    dashboarding stack derives from raw ticks.

    Determinism: open/close come from min_by/max_by keyed on the
    STRUCT (ts, event_id) — a total order, so duplicate timestamps
    cannot flap the edge values between runs or engines (the oracle
    derives the same rows via tie-broken rank windows). Values are
    copied, never combined: zero float arithmetic, exact hash compare.

    Scale: ONE map-side-combinable aggregation — min_by/max_by fold
    per partition carrying just (value, key) pairs, so raw ticks
    never shuffle; the exchange carries one row per (type, hour)
    cell. Compare gapfill_ffill, which needs per-row windows: OHLC is
    the cheap path when only bucket edges/extrema matter."""
    e = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
        ).agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
