"""Data-quality operators: referential-integrity auditing, per-column
profiling, and the reconciliation (full-outer) comparison shape.

The reference trusts its own invariants (FileTable's maps cannot hold a
replica for an unknown chunk — controller/FileTable.java:107-122 keys
replicas under the chunk entry itself); a lakehouse ingesting 100 TB of
parquet from elsewhere cannot, so constraint CHECKS become queries:
count what violates instead of assuming nothing does. All three are
single-purpose, oracle-exact, and shuffle only aggregate-sized or
key-only data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

RI_ORACLE = """
SELECT 'orders.o_custkey->customer' AS fk,
       CAST(count(*) AS BIGINT) AS n_orphans
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem.l_orderkey->orders' AS fk,
       CAST(count(*) AS BIGINT) AS n_orphans
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'customer.c_nationkey->nation' AS fk,
       CAST(count(*) AS BIGINT) AS n_orphans
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
"""


@query("referential_integrity", oracle=RI_ORACLE)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit: orphan counts for the three fixture FK edges
    (orders->customer, lineitem->orders, customer->nation), each an
    anti-join + count. The lakehouse replacement for constraints the
    storage layer doesn't enforce — run after ingest, alert on > 0.

    Scale: each leg anti-joins on a single key column. Only the
    nation side is EXPLICITLY broadcast — it is the one genuinely
    bounded dimension (25 rows at any SF). The customer and orders
    parent-key sets scale with the data, so those legs stay shuffle
    anti-joins on purpose (at local SFs AQE still converts them to
    broadcast at runtime from observed sizes — the safe direction;
    forcing the broadcast by hand would OOM the build side at 100 TB).
    Every leg shuffles key columns only, never rows. Output is 3 rows
    regardless of scale."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def leg(
        name: str,
        child: DataFrame,
        ck: str,
        parent: DataFrame,
        pk: str,
        bcast: bool = False,
    ):
        keys = parent.select(F.col(pk).alias(ck))
        if bcast:
            keys = F.broadcast(keys)
        return (
            child.select(F.col(ck))
            .join(keys, ck, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    return (
        leg("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey")
        .unionByName(
            leg("lineitem.l_orderkey->orders", l, "l_orderkey", o, "o_orderkey")
        )
        .unionByName(
            leg(
                "customer.c_nationkey->nation",
                c,
                "c_nationkey",
                n,
                "n_nationkey",
                bcast=True,
            )
        )
    )


PROFILE_ORACLE = """
SELECT 'event_id' AS col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(event_id) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(min(event_id) AS VARCHAR) AS min_str,
       CAST(max(event_id) AS VARCHAR) AS max_str
FROM events
UNION ALL
SELECT 'user_id', count(*), count(user_id), count(DISTINCT user_id),
       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
FROM events
UNION ALL
SELECT 'event_type', count(*), count(event_type),
       count(DISTINCT event_type), min(event_type), max(event_type)
FROM events
"""


@query("table_profile", oracle=PROFILE_ORACLE)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the df.summary()/ANALYZE TABLE shape, made
    oracle-exact): row count, non-null count, exact distinct count,
    and min/max rendered as strings, one output row per profiled
    column of `events`. Doubles are deliberately excluded from min/max
    string rendering — float formatting differs across engines; ids
    and categorical strings render identically.

    Scale: one aggregation pass per column over a pruned scan; the
    exact distincts make this the small-SF anchor — the 100 TB variant
    swaps count(DISTINCT) for approx_count_distinct exactly as
    distinct_customers_approx demonstrates, keeping state kB-bounded.
    Output is #columns rows."""
    e = load_table(spark, sf_dir, "events")

    def prof(col: str) -> DataFrame:
        return e.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_str"),
            F.max(col).cast("string").alias("max_str"),
        ).select(F.lit(col).alias("col"), "*")

    return prof("event_id").unionByName(prof("user_id")).unionByName(
        prof("event_type")
    )


RECON_ORACLE = """
WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_customers
  FROM customer GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT n.n_name AS nation,
       CAST(coalesce(c.n_customers, 0) AS BIGINT) AS n_customers,
       CAST(coalesce(s.n_suppliers, 0) AS BIGINT) AS n_suppliers,
       CAST(CASE WHEN c.nationkey IS NULL THEN 'suppliers_only'
                 WHEN s.nationkey IS NULL THEN 'customers_only'
                 ELSE 'both' END AS VARCHAR) AS presence
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
JOIN nation n ON n.n_nationkey = coalesce(c.nationkey, s.nationkey)
"""


@query("nation_reconcile", oracle=RECON_ORACLE)
def nation_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided reconciliation via FULL OUTER join — the compare-two-
    systems shape (billing vs shipping, old pipeline vs new): customer
    and supplier presence per nation, with rows preserved when either
    side is missing and a presence verdict per key. Completes the join
    surface (inner/left/semi/anti/cross/asof/range elsewhere; this is
    the engine's full-outer row).

    Scale: both sides pre-aggregate to #nations rows BEFORE the full
    outer join, so the join is aggregate-sized; the nation name lookup
    broadcasts. The pattern at 100 TB: always full-outer-join the
    AGGREGATES, never the raw fact tables."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    n = load_table(spark, sf_dir, "nation")
    joined = c.withColumnRenamed("nationkey", "c_nk").join(
        s.withColumnRenamed("nationkey", "s_nk"),
        F.col("c_nk") == F.col("s_nk"),
        "full_outer",
    )
    return (
        joined.join(
            F.broadcast(n),
            n.n_nationkey == F.coalesce(F.col("c_nk"), F.col("s_nk")),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.when(F.col("c_nk").isNull(), "suppliers_only")
            .when(F.col("s_nk").isNull(), "customers_only")
            .otherwise("both")
            .cast("string")
            .alias("presence"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-width histogram (distribution profiling)
# ---------------------------------------------------------------------------

HIST_NB = 20  # buckets


VALUE_HISTOGRAM_ORACLE = f"""
WITH ext AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
),
b AS (
  SELECT least(CAST(floor((value - lo) * {HIST_NB} / (hi - lo)) AS BIGINT),
               {HIST_NB - 1}) AS bucket,
         lo, hi
  FROM events CROSS JOIN ext
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       lo + bucket * (hi - lo) / {HIST_NB} AS bucket_lo,
       lo + (bucket + 1) * (hi - lo) / {HIST_NB} AS bucket_hi,
       count(*) AS n
FROM b GROUP BY bucket, lo, hi
"""


@query("value_histogram", oracle=VALUE_HISTOGRAM_ORACLE)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width {HIST_NB}-bucket histogram of the event value
    distribution — the profiling primitive behind every "show me the
    distribution" dashboard panel (and the one table_profile's
    min/max/count summary can't draw).

    Bucketing floors the SAME IEEE expression ((v-lo)*{HIST_NB}/(hi-lo))
    in both engines — identical operand order, so a value landing
    within one ulp of a bucket edge floors identically and the hash
    compare holds; the max value clamps into the last bucket. Scale:
    one 2-value extrema aggregate broadcast back onto the scan, one
    {HIST_NB}-cell groupBy with map-side combine. Empty buckets are
    absent by design (count 0 rows can't be grouped); renderers
    densify with a sequence() join if needed."""
    ev = load_table(spark, sf_dir, "events")
    ext = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    bucket = F.least(
        F.floor(
            (F.col("value") - F.col("lo")) * HIST_NB / (F.col("hi") - F.col("lo"))
        ),
        F.lit(HIST_NB - 1),
    )
    return (
        ev.crossJoin(F.broadcast(ext))
        .select(bucket.alias("bucket"), "lo", "hi")
        .groupBy("bucket", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            (
                F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo")) / HIST_NB
            ).alias("bucket_lo"),
            (
                F.col("lo")
                + (F.col("bucket") + 1) * (F.col("hi") - F.col("lo")) / HIST_NB
            ).alias("bucket_hi"),
            "n",
        )
    )
