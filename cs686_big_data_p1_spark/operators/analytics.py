"""General analytics parity queries (SURVEY.md §2.I E6).

TPC-H-style pipelines proving the full relational surface — scans with
pushdown, multi-way joins (broadcast + shuffle), grouped/distinct
aggregation, ranking windows, rollup — over the driver fixture tables.

Numeric policy (oracle parity): monetary aggregates are computed in
DECIMAL (exact, order-independent) and cast to DOUBLE only at the end,
so Spark's partial-aggregation order can never drift from DuckDB's
serial sum. Averages divide the exact decimal sum by the count in
double — identical IEEE arithmetic in both engines.

Scale notes are per-query in docstrings; the common rules: dimension
tables are broadcast (no shuffle of the fact side), filters are pushed
to the parquet scan, aggregations are partial+final (map-side combine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query, track_cache
from ..tables import load_table


def dec(c: str) -> Column:
    return F.col(c).cast("decimal(12,6)")


# Money math is fixed-point: every monetary column is scaled to an exact
# 1e6 integer (decimal(38,0) Spark-side, HUGEINT oracle-side), summed in
# integer space, and divided back to double ONCE at the end. A decimal
# sum cast straight to double goes through scaled-int/1e12 DOUBLE
# division in DuckDB, which drifts a ulp once the scaled total passes
# 2^53 — this form makes both engines convert the SAME exact integer.
def s6(c: str) -> Column:
    """Column -> exact 1e6-scaled integer (decimal(38,0))."""
    return (dec(c) * F.lit(1_000_000)).cast("decimal(38,0)")


# The exact integer sum is converted to double via an explicit
# quotient/remainder split (each piece fits int64), because a direct
# 128-bit-integer -> double conversion is double-rounded in DuckDB and
# drifts a ulp from Spark's correctly-rounded BigDecimal conversion.
# Both engines evaluate the identical q + r/scale IEEE expression.
def unscale(col_name: str, pow10: int) -> Column:
    """PRECONDITION: the scaled total must be NONNEGATIVE. Spark's
    truncating `div` + positive-remainder `pmod` here pair with the
    oracle side's floor `//` + sign-following `%` — the two agree only
    for nonnegative operands, so reusing this helper on a column that
    can go negative silently breaks the ulp-exact contract. All current
    money columns (prices, quantities, discounts) are nonnegative."""
    sc = 10**pow10
    return F.expr(
        f"CAST({col_name} div {sc} AS DOUBLE) "
        f"+ CAST(CAST(pmod({col_name}, {sc}) AS BIGINT) AS DOUBLE) / {sc}.0"
    )


def disc_factor() -> Column:
    return F.lit(1_000_000).cast("decimal(38,0)") - s6("l_discount")


def rev_sum() -> Column:
    """sum(price * (1 - discount)) as an exact 1e12-scaled integer sum."""
    return F.sum(s6("l_extendedprice") * disc_factor())


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       (CAST((sum(CAST(CAST(l_quantity AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_quantity AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) AS sum_qty,
       (CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) AS sum_base_price,
       (CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT) * (1000000 - CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT)))) // 1000000000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT) * (1000000 - CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT)))) % 1000000000000 AS DOUBLE) / 1000000000000.0) AS sum_disc_price,
       (CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT) * (1000000 - CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT)) * (1000000 + CAST(CAST(l_tax AS DECIMAL(12,6)) * 1000000 AS HUGEINT)))) // 1000000000000000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT) * (1000000 - CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT)) * (1000000 + CAST(CAST(l_tax AS DECIMAL(12,6)) * 1000000 AS HUGEINT)))) % 1000000000000000000 AS DOUBLE) / 1000000000000000000.0) AS sum_charge,
       (CAST((sum(CAST(CAST(l_quantity AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_quantity AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) / count(*) AS avg_qty,
       (CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) / count(*) AS avg_price,
       (CAST((sum(CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing", oracle=Q1_ORACLE)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-style pricing summary: scan -> filter -> groupBy -> 8 aggregates.

    Scale: single pass over lineitem; the shipdate filter and the 7-column
    projection push to the parquet scan; 6-group hash agg is map-side
    partial so the shuffle carries one row per (partition x group).
    """
    l = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(s6("l_quantity")).alias("_qty"),
            F.sum(s6("l_extendedprice")).alias("_price"),
            rev_sum().alias("_rev"),
            F.sum(
                s6("l_extendedprice")
                * disc_factor()
                * (F.lit(1_000_000).cast("decimal(38,0)") + s6("l_tax"))
            ).alias("_charge"),
            F.sum(s6("l_discount")).alias("_disc"),
            cnt.alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            unscale("_qty", 6).alias("sum_qty"),
            unscale("_price", 6).alias("sum_base_price"),
            unscale("_rev", 12).alias("sum_disc_price"),
            unscale("_charge", 18).alias("sum_charge"),
            (unscale("_qty", 6) / F.col("count_order")).alias("avg_qty"),
            (unscale("_price", 6) / F.col("count_order")).alias("avg_price"),
            (unscale("_disc", 6) / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )


Q3_ORACLE = """
SELECT l_orderkey,
       (CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT) * (1000000 - CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT)))) // 1000000000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT) * (1000000 - CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT)))) % 1000000000000 AS DOUBLE) / 1000000000000.0) AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


@query("tpch_q3_shipping", oracle=Q3_ORACLE)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style top-10 unshipped-revenue orders: 3-way join + agg + top-k.

    Scale: customer is filtered to one segment then BROADCAST into
    orders (no shuffle of orders for that join); orders><lineitem is the
    one shuffle join, on the natural key. Top-10 is a global sort-limit:
    Spark takes per-partition top-10 then merges (TakeOrderedAndProject)
    — no full sort. Tie-break on (o_orderdate, l_orderkey) makes LIMIT
    deterministic for the oracle.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev_sum().alias("_rev"))
        .select(
            "l_orderkey",
            unscale("_rev", 12).alias("revenue"),
            "o_orderdate",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


Q5_ORACLE = """
SELECT n_name,
       (CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT) * (1000000 - CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT)))) // 1000000000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT) * (1000000 - CAST(CAST(l_discount AS DECIMAL(12,6)) * 1000000 AS HUGEINT)))) % 1000000000000 AS DOUBLE) / 1000000000000.0) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("tpch_q5_localsupp", oracle=Q5_ORACLE)
def tpch_q5_localsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style local-supplier revenue: 6-way join, mixed broadcast/shuffle.

    Scale: region/nation/supplier are broadcast (tiny dims); the
    customer><orders and orders><lineitem joins shuffle on their keys.
    Catalyst pushes r_name and the date range to the scans and prunes
    every unused column.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(rev_sum().alias("_rev"))
        .select("n_name", unscale("_rev", 12).alias("revenue"))
    )


TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_customer
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
             AS rank_in_customer
  FROM orders
)
WHERE rank_in_customer <= 3
"""


@query("topk_orders_per_customer", oracle=TOPK_ORACLE)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — ranking window (O6/O3 analog).

    Scale: one shuffle on o_custkey; per-group sort is bounded. Spark
    4's WindowGroupLimit pushes the rank<=3 limit below the sort, so
    executors keep only 3 rows per key.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rank_in_customer"),
        )
        .where(F.col("rank_in_customer") <= 3)
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
GROUP BY o_orderpriority
"""


@query("tpch_q4_priority", oracle=Q4_ORACLE)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-style correlated EXISTS: orders having a discounted lineitem,
    counted per priority — the relational form is a left-semi join.

    Scale: the EXISTS never materializes matches — semi join stops at
    the first hit per key; the discount filter pushes to the lineitem
    scan so the probe side is pre-shrunk.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.05)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q17_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey,
         (CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(l_extendedprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) / count(*) AS avg_price
  FROM lineitem GROUP BY l_partkey
)
SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, l.l_extendedprice,
       p.avg_price
FROM lineitem l JOIN part_avg p ON l.l_partkey = p.l_partkey
WHERE l.l_extendedprice > 1.5 * p.avg_price
"""


@query("price_outliers", oracle=Q17_ORACLE)
def price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-style scalar correlated subquery: lineitems priced > 1.5x
    their part's average — decorrelated to aggregate + self-join.

    Scale: one pass builds the per-part average (map-side partial agg),
    then a shuffle join on l_partkey; both sides hash-partition on the
    same key so AQE can coalesce. The exact-decimal average keeps the
    1.5x threshold comparison bit-stable against the oracle.
    """
    l = load_table(spark, sf_dir, "lineitem")
    pa = (
        l.groupBy("l_partkey")
        .agg(
            F.sum(s6("l_extendedprice")).alias("_price"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "l_partkey",
            (unscale("_price", 6) / F.col("_n")).alias("avg_price"),
        )
    )
    return (
        l.join(pa, "l_partkey")
        .where(F.col("l_extendedprice") > 1.5 * F.col("avg_price"))
        .select(
            "l_orderkey",
            "l_partkey",
            "l_linenumber",
            "l_extendedprice",
            "avg_price",
        )
    )


SETOPS_ORACLE = """
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1996),
     y97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1997)
SELECT o_custkey, 'both' AS cohort FROM (
  SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
UNION ALL
SELECT o_custkey, 'only_1996' AS cohort FROM (
  SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
"""


@query("customer_year_setops", oracle=SETOPS_ORACLE)
def customer_year_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: INTERSECT + EXCEPT + UNION ALL over yearly
    customer cohorts (retention/churn shape).

    Scale: both cohorts come from one orders scan each with the year
    filter pushed down; intersect/except hash-partition on the key —
    the same single-shuffle shape as a semi/anti join.
    """
    o = load_table(spark, sf_dir, "orders")
    y96 = (
        o.where(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    )
    y97 = (
        o.where(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    )
    both = y96.intersect(y97).select(
        "o_custkey", F.lit("both").alias("cohort")
    )
    only96 = y96.exceptAll(y97).select(
        "o_custkey", F.lit("only_1996").alias("cohort")
    )
    return both.unionAll(only96)


DATE_CUBE_ORACLE = """
SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
       count(*) AS n_orders,
       (CAST((sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) AS sum_total
FROM orders
GROUP BY CUBE (year(o_orderdate), quarter(o_orderdate))
"""


@query("order_date_cube", oracle=DATE_CUBE_ORACLE)
def order_date_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + full CUBE over (year, quarter): all four
    grouping-set combinations in one pass.

    Scale: like rollup, cube is one Expand (4x group rows) + a single
    hash-agg shuffle — no repeated scans of orders.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        "o_totalprice",
    )
    return (
        o.cube("y", "q")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(s6("o_totalprice")).alias("_tot"),
        )
        .select("y", "q", "n_orders", unscale("_tot", 6).alias("sum_total"))
    )


ROLLUP_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       (CAST((sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


@query("priority_rollup", oracle=ROLLUP_ORACLE)
def priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup over (priority, status) with grand total.

    Scale: Spark expands rollup into a single Expand + hash aggregate —
    one shuffle, 3x the group rows, no extra passes over orders.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(s6("o_totalprice")).alias("_tot"),
        )
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "n_orders",
            unscale("_tot", 6).alias("sum_total"),
        )
    )


PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_PIVOT_COLS_SQL = ",\n       ".join(
    f"""CAST(count(CASE WHEN o_orderpriority = '{p}' THEN 1 END) AS BIGINT)
           AS "{p}\"""" for p in PRIORITIES
)

PIVOT_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       {_PIVOT_COLS_SQL}
FROM orders
GROUP BY year(o_orderdate)
"""


@query("priority_pivot", oracle=PIVOT_ORACLE)
def priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts cross-tabulated year x priority — the
    wide-format reporting shape (one row per year, one column per
    priority). The pivot values are an explicit list, so the output
    schema is static (never data-dependent — a data-driven pivot would
    need an extra distinct-scan job and make the schema racy at scale)
    and matches the oracle's CASE-aggregation column for column."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            "o_orderpriority",
        )
        .groupBy("order_year")
        .pivot("o_orderpriority", PRIORITIES)
        .count()
        .na.fill(0, PRIORITIES)
    )


_PR_LIST_SQL = ", ".join(f"'{p}'" for p in PRIORITIES)

UNPIVOT_ORACLE = f"""
WITH yrs AS (
  SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS order_year
  FROM orders
),
pr AS (SELECT unnest([{_PR_LIST_SQL}]) AS o_orderpriority),
cnts AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         o_orderpriority, count(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT y.order_year, p.o_orderpriority,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
FROM yrs y
CROSS JOIN pr p
LEFT JOIN cnts c
  ON c.order_year = y.order_year
 AND c.o_orderpriority = p.o_orderpriority
"""


@query("priority_unpivot", oracle=UNPIVOT_ORACLE)
def priority_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: melt the year x priority cross-tab (priority_pivot's
    output) back to long form with stack() — the wide-to-long half of
    the reshaping pair. Zero-count cells survive the round trip (the
    pivot filled them with 0), so pivot -> unpivot is lossless and the
    oracle builds the same dense year x priority grid.

    Scale: stack() is a pure projection (each input row fans out to
    #priorities rows JVM-side, no shuffle, no Python); the only
    exchange is the upstream pivot aggregate's, and the output is
    #years x #priorities rows regardless of table size."""
    wide = priority_pivot(spark, sf_dir)
    pairs = ", ".join(f"'{p}', `{p}`" for p in PRIORITIES)
    return wide.select(
        "order_year",
        F.expr(
            f"stack({len(PRIORITIES)}, {pairs}) "
            "AS (o_orderpriority, n_orders)"
        ),
    )


MEDIAN_ORACLE = """
SELECT o_orderpriority,
       CAST(avg(v) AS DOUBLE) AS median_price,
       CAST(max(n) AS BIGINT) AS n_orders
FROM (
  SELECT o_orderpriority,
         CAST(o_totalprice AS DOUBLE) AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rk,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
WHERE rk IN ((n + 1) // 2, (n + 2) // 2)
GROUP BY o_orderpriority
"""


# Value-bucket width for the two-phase median. o_totalprice spans
# ~[900, 600k), so 4096 gives ~150 histogram cells per priority; the
# growth rule at 100 TB is narrower buckets (or a second histogram pass
# inside the target bucket) so the filtered phase-2 set stays reducer-
# sized — the histogram itself is a map-side-combined groupBy whose
# output is #groups x #buckets rows regardless of table size.
MEDIAN_BUCKET_W = 4096


def _price_cum_histogram(o: DataFrame) -> DataFrame:
    """Phase-1 helper for the exact two-phase rank queries
    (price_median, price_quantiles): histogram orders into
    (o_orderpriority, floor(o_totalprice / MEDIAN_BUCKET_W)) cells —
    one map-side-combinable groupBy over the full scan — and annotate
    each cell with its running start_rank and the group total n. The
    windows here run over the #groups x #buckets AGGREGATE (a few
    hundred rows), never the base table."""
    from pyspark.sql.window import Window

    bkt = F.floor(F.col("o_totalprice") / MEDIAN_BUCKET_W).cast("bigint")
    hist = o.groupBy(F.col("o_orderpriority"), bkt.alias("bkt")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_prev = (
        Window.partitionBy("o_orderpriority")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("o_orderpriority").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "o_orderpriority",
        "bkt",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_prev), F.lit(0)).alias("start_rank"),
        F.sum("cnt").over(w_all).alias("n"),
    )


@query("price_median", oracle=MEDIAN_ORACLE)
def price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median, two-phase (no full per-group sort).

    Phase 1: histogram orders into (priority, floor(price/W)) cells —
    a map-side-combinable groupBy — then, on that tiny aggregate,
    running bucket counts locate which cell holds each group's middle
    rank(s) m1=(n+1)//2, m2=(n+2)//2.  Phase 2: re-scan filtered to
    ONLY those target cells via a broadcast semi-structure (<= 2 cells
    per priority), rank within the cell (row_number ordered by price,
    o_orderkey for a deterministic tie-break) offset by the cell's
    start rank, keep global ranks {m1, m2}, and average the <= 2
    values.

    The r3 plan ranked EVERY order inside 5 priority partitions — a
    5-reducer funnel at 100 TB (VERDICT item #3). Here no window ever
    sees more than one histogram cell's rows; the only per-group
    sequential step runs on the #priorities x #buckets histogram. The
    oracle keeps the straightforward full-rank formulation — two
    independent median implementations agreeing bit-for-bit (avg of
    the same <= 2 doubles)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    bkt = F.floor(F.col("o_totalprice") / MEDIAN_BUCKET_W).cast("bigint")
    cum = _price_cum_histogram(o)
    m1 = F.floor((F.col("n") + 1) / 2)
    m2 = F.floor((F.col("n") + 2) / 2)
    end_rank = F.col("start_rank") + F.col("cnt")
    targets = cum.where(
        ((F.col("start_rank") < m1) & (m1 <= end_rank))
        | ((F.col("start_rank") < m2) & (m2 <= end_rank))
    ).select("o_orderpriority", "bkt", "start_rank", "n")
    filtered = o.select(
        "o_orderpriority",
        "o_totalprice",
        "o_orderkey",
        bkt.alias("bkt"),
    ).join(F.broadcast(targets), ["o_orderpriority", "bkt"])
    w_cell = Window.partitionBy("o_orderpriority", "bkt").orderBy(
        "o_totalprice", "o_orderkey"
    )
    rk = F.row_number().over(w_cell) + F.col("start_rank")
    mid = filtered.withColumn("rk", rk).where(
        (F.col("rk") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rk") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.groupBy("o_orderpriority").agg(
        F.avg(F.col("o_totalprice").cast("double")).alias("median_price"),
        F.max("n").cast("bigint").alias("n_orders"),
    )


@query("distinct_customers_approx")
def distinct_customers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog sketch per order-year: approx_count_distinct over
    customers, next to the exact count. The sketch is THE way to count
    distincts at 100 TB (fixed ~kB state per group vs a full
    distinct-shuffle); rows-only by design — HLL estimates are
    implementation-specific, so the pytest asserts relative error
    against the exact count instead of an oracle hash."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            "o_custkey",
        )
        .groupBy("order_year")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
            F.count_distinct("o_custkey").alias("exact_custs"),
        )
        .orderBy("order_year")
    )


ASOF_ORACLE = """
WITH views AS (
  SELECT user_id, ts, max(event_id) AS event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
purchases AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       v.event_id AS asof_view_id, v.ts AS asof_view_ts
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@query("asof_join", oracle=ASOF_ORACLE)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF (point-in-time) join: for every purchase event, the same
    user's latest view event at-or-before it (last-touch attribution)
    — the operator behind trade/quote matching and feature-store
    point-in-time lookups, which Spark has no built-in for.

    Implementation is the canonical distributed as-of pattern: tag
    both sides, union, and take last(view, ignorenulls) over a
    per-user window ordered by (time, side) — view rows sort before
    purchase rows at equal timestamps, giving <= semantics. ONE
    shuffle on the key (no per-row range probing, no cross join); at
    100 TB the key becomes (user, time-bucket) so windows stay
    bounded, with bucket-boundary views duplicated one bucket
    forward. The view side is deduplicated to max(event_id) per
    (user, ts) in both engines so ties are deterministic. Oracle:
    DuckDB's NATIVE ASOF LEFT JOIN — two independent as-of
    implementations agreeing row-for-row.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select(
            "user_id",
            F.col("ts").alias("t"),
            "event_id",
            F.lit(0).alias("side"),
        )
        .withColumn("purchase_id", F.lit(None).cast("bigint"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
    )
    un = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = un.select(
        "user_id",
        "t",
        "side",
        "purchase_id",
        F.last("event_id", ignorenulls=True).over(w).alias("asof_view_id"),
        F.last(F.when(F.col("side") == 0, F.col("t")), ignorenulls=True)
        .over(w)
        .alias("asof_view_ts"),
    )
    return matched.where(F.col("side") == 1).select(
        "purchase_id",
        "user_id",
        F.col("t").alias("purchase_ts"),
        "asof_view_id",
        "asof_view_ts",
    )


# Bucket width for the bounded-window as-of variant. Growth rule at
# 100 TB: pick the width so one (user, bucket) slice fits a reducer;
# the carry table is one row per ACTIVE (user, bucket) — orders of
# magnitude smaller than the event stream — so its per-user window is
# the only sequential step and it runs on aggregates, never raw events.
ASOF_BUCKET_S = 6 * 3600


def asof_join_bucketed_frames(
    views: DataFrame, purchases: DataFrame, bucket_s: int = ASOF_BUCKET_S
) -> DataFrame:
    """Bounded-window as-of join (the 100 TB form of asof_join).

    asof_join's single per-user window is exact but unbounded: one
    hyperactive user serializes through one reducer. Here every window
    is bounded by the time bucket:

      1. per-(user, bucket) LAST VIEW — a map-side-combinable groupBy
         (max of a (t, event_id) struct);
      2. CARRY = as-of state at each bucket start — last non-null
         aggregate over the user's PRECEDING buckets, a window over the
         tiny (user, active-bucket) table, then injected into the
         bucket as a synthetic boundary row sorting before all events
         (the docstring'd boundary-row duplication);
      3. the same union + last(ignorenulls) resolution as asof_join,
         but partitioned by (user, bucket) — bounded partitions.

    Inputs: views (user_id, t, event_id) deduped to one row per
    (user, t); purchases (user_id, t, purchase_id). Output schema and
    semantics are identical to asof_join (pytest-pinned parity; the
    registered query shares its DuckDB ASOF JOIN oracle)."""
    from pyspark.sql.window import Window

    bkt = lambda: F.floor(F.unix_timestamp("t") / bucket_s).cast("bigint")  # noqa: E731
    v = views.select("user_id", "t", "event_id", bkt().alias("bkt"))
    p = purchases.select("user_id", "t", "purchase_id", bkt().alias("bkt"))
    last_view = v.groupBy("user_id", "bkt").agg(
        F.max(F.struct("t", "event_id")).alias("lv")
    )
    buckets = (
        last_view.select("user_id", "bkt")
        .union(p.select("user_id", "bkt"))
        .distinct()
    )
    w_carry = (
        Window.partitionBy("user_id")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = buckets.join(last_view, ["user_id", "bkt"], "left").select(
        "user_id",
        "bkt",
        F.last("lv", ignorenulls=True).over(w_carry).alias("carry"),
    )
    carry_rows = carry.select(
        "user_id",
        "bkt",
        F.timestamp_seconds(F.col("bkt") * bucket_s).alias("t"),
        F.lit(-1).alias("side"),  # sorts before any event at bucket start
        F.col("carry.event_id").alias("view_id"),
        F.col("carry.t").alias("view_ts"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    view_rows = v.select(
        "user_id",
        "bkt",
        "t",
        F.lit(0).alias("side"),
        F.col("event_id").alias("view_id"),
        F.col("t").alias("view_ts"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchase_rows = p.select(
        "user_id",
        "bkt",
        "t",
        F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("view_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
        "purchase_id",
    )
    un = carry_rows.unionByName(view_rows).unionByName(purchase_rows)
    w = (
        Window.partitionBy("user_id", "bkt")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = un.select(
        "user_id",
        "t",
        "side",
        "purchase_id",
        F.last("view_id", ignorenulls=True).over(w).alias("asof_view_id"),
        F.last("view_ts", ignorenulls=True).over(w).alias("asof_view_ts"),
    )
    return matched.where(F.col("side") == 1).select(
        "purchase_id",
        "user_id",
        F.col("t").alias("purchase_ts"),
        "asof_view_id",
        "asof_view_ts",
    )


@query("asof_join_bucketed", oracle=ASOF_ORACLE)
def asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """asof_join's bounded-window form on the events fixture — same
    output, same DuckDB ASOF JOIN oracle, but no unbounded per-user
    window anywhere in the plan (see asof_join_bucketed_frames)."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("user_id", F.col("ts").alias("t"), "event_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.col("event_id").alias("purchase_id"),
    )
    return asof_join_bucketed_frames(views, purchases)


RANGE_WINDOW_S = 3600  # the attribution lookback window

RANGE_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id,
       CAST(count(v.event_id) AS BIGINT) AS n_views_1h
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
"""


@query("range_join_views", oracle=RANGE_JOIN_ORACLE)
def range_join_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join: views per user in the hour before each purchase —
    the interval-predicate join (t in (p - 1h, p]) Spark would
    otherwise execute as a per-user cross join with a post-filter.

    Bucketed implementation: both sides bucket to the window width
    (floor(epoch/3600)); each view is duplicated into its own and the
    next bucket (the only two a purchase within one hour can land in),
    the join runs on the (user, bucket) EQUI key, and the exact range
    predicate filters the at-most-2x candidates. Work is O(matches),
    not O(pairs-per-user); the shuffle key stays an int pair. Oracle:
    the plain inequality join DuckDB can afford at oracle scale."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pt"),
        F.floor(F.unix_timestamp("ts") / RANGE_WINDOW_S).alias("b"),
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("vt"),
            F.floor(F.unix_timestamp("ts") / RANGE_WINDOW_S).alias("vb"),
        )
        .select(
            "user_id",
            "vt",
            F.explode(F.array(F.col("vb"), F.col("vb") + 1)).alias("b"),
        )
    )
    hits = (
        p.join(v, ["user_id", "b"])
        .where(
            (F.col("vt") <= F.col("pt"))
            & (
                F.col("vt")
                > F.col("pt") - F.expr(f"INTERVAL {RANGE_WINDOW_S} SECOND")
            )
        )
        .groupBy("purchase_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        p.select("purchase_id", "user_id")
        .join(hits, ["purchase_id", "user_id"], "left")
        .select(
            "purchase_id",
            "user_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_views_1h"),
        )
    )


# Bucket count for the two-phase global rank. Equal-width value buckets
# between the broadcast 1-row extrema; a hot bucket holding a SINGLE
# tied value is further sub-split on equal-width ranges of the TIE
# column (ties order by tie_col, so a monotone tie bucketing preserves
# the total order). Correctness never depends on the bucket population
# (rank = within-composite-bucket row_number + the bucket's cumulative
# offset, and the composite key is monotone in the total order), only
# the balance does.
RANK_BUCKETS = 4096

# Depth cap for the fixpoint sub-split: the per-level keys pack into a
# single decimal(38,0) at radix RANK_BUCKETS+2, and (4098)^10 ~ 1.3e36
# is the deepest that fits. Each level at least halves a surviving
# cell's discriminating range, so 10 levels cover any real skew shape;
# see _rank_bucketed's docstring for the (adversarial-only) residual.
_MAX_SPLIT_LEVELS = 10

# Absolute hot floor: a composite cell only sub-splits when it holds
# more rows than this, IN ADDITION to exceeding its proportional n/B
# share. A cell a single task row_numbers in microseconds is not a
# straggler whatever its share — without the floor, at fixture scale
# (n ~ 15k, B = 4096) every 4-row cell counts as "hot" and the
# fixpoint grinds through split levels that cannot matter. At cluster
# scale n/B >> the floor, so the floor never weakens the skew
# guarantee where it matters; the worst residual cell is
# max(n/B, this) rows in one task.
_MIN_SPLIT_ROWS = RANK_BUCKETS


def _rank_bucketed(
    df: DataFrame, value_col: str, tie_col: str, desc: bool = False
) -> DataFrame:
    """Phase 1 of the two-phase global rank: localCheckpoint the input
    and assign the composite bucket key (_bkt, _sub), monotone in the
    total order (value asc|desc, tie asc). Split out so the skew pytest
    can inspect bucket populations directly.

      * `_v` — the value cast to exact decimal(38,0), negated for desc.
      * `_bkt` — equal-width value bucket between the (broadcast, 1-row)
        extrema. DIVISION-FIRST math, `(_v - _lo) div w` with
        `w = (_hi - _lo) div B + 1` (= ceil((hi-lo+1)/B)), so the old
        `(_v-_lo)*B` multiply can never overflow decimal(38,0); if the
        subtraction itself overflows (value range wider than 38 digits)
        the bucket is raised as an error rather than silently NULLed
        into a dropped row. NULL values get a sentinel bucket ranked
        where the replaced Window.orderBy put them: FIRST for asc
        (bucket -1), LAST for desc (bucket B) — Spark's asc/desc
        defaults.
      * `_sub` — the FIXPOINT sub-split (r8 verdict #2: the old single
        level left a dominant tied value inside a wide multi-value
        bucket in one task). Each iteration splits every cell that is
        still HOT (> n/B rows AND > _MIN_SPLIT_ROWS — the absolute
        floor below which one task cannot straggle) and SPLITTABLE,
        on whichever range
        still discriminates: a SINGLE-value cell (null-safe compare,
        so the all-NULL sentinel bucket splits too) orders purely by
        tie and splits on equal-width TIE ranges (requires a numeric
        tie with positive range); a MULTI-value cell splits on
        equal-width VALUE ranges. Both keys are monotone in the total
        order (value asc, tie asc); sub counts are allocated
        proportionally (m = min(B, count*B/n + 1), so a hot cell
        always gets m >= 2 and its range at least halves per level) —
        iteration terminates when every cell is cold or is a pure
        full-tie group (identical (value, tie) — row_number order
        within it is arbitrary-but-valid, and no deterministic split
        exists). NULL sub-keys get sentinel sub -1 (tie asc = NULLS
        FIRST). The per-level sub keys are packed into ONE `_sub`
        decimal(38,0) by fixed-radix (B+2) positional encoding —
        lexicographic, hence still monotone — which caps the depth at
        {_MAX_SPLIT_LEVELS} levels; since each level divides a
        surviving cell's discriminating range by >= 2 (usually by
        ~c*B/n >> 2 for the cells that matter), the cap is reached
        only by adversarial Cantor-style recursive clustering across
        >= (B+2)^{_MAX_SPLIT_LEVELS} of range, at which point the
        residual cell is that many times narrower than the r8
        one-level residual.

    The input is localCheckpoint'ed (the dedup_clusters/pagerank
    lineage-cut discipline): the plan references it several times
    (extrema, per-bucket stats, composite histogram, final join), and
    without the cut each reference re-embeds — and re-executes — the
    whole upstream subtree (chaining three ranks in customer_rfm
    multiplied the orders scan 32x before this cut). The two bounded
    aggregates (1-row extrema, <=B+2-row bucket stats) are
    track_cache'd so later references don't re-scan the checkpoint."""
    from pyspark.sql import types as T

    df = df.localCheckpoint(eager=True)
    v = F.col(value_col).cast("decimal(38,0)")
    if desc:
        v = -v
    d = df.withColumn("_v", v)
    if isinstance(df.schema[tie_col].dataType, T.NumericType):
        d = d.withColumn("_t", F.col(tie_col).cast("decimal(38,0)"))
    else:
        d = d.withColumn("_t", F.lit(None).cast("decimal(38,0)"))
    ext = track_cache(
        d.agg(
            F.min("_v").alias("_lo"),
            F.max("_v").alias("_hi"),
            F.count(F.lit(1)).alias("_tot"),
        )
    )
    d = d.crossJoin(F.broadcast(ext))
    null_bkt = RANK_BUCKETS if desc else -1
    bkt = F.expr(f"(_v - _lo) div ((_hi - _lo) div {RANK_BUCKETS} + 1)")
    d = d.withColumn(
        "_bkt",
        F.when(F.col("_v").isNull(), F.lit(null_bkt).cast("bigint")).otherwise(
            F.coalesce(
                bkt.cast("bigint"),
                F.expr(
                    "raise_error('_two_phase_global_rank: value-bucket "
                    "overflow (range exceeds decimal(38,0))')"
                ).cast("bigint"),
            )
        ),
    ).drop("_lo", "_hi")
    # Fixpoint sub-split. Each level: ONE bounded per-cell stats job
    # collected to the driver, which both decides convergence and
    # yields the split parameters (so the level costs exactly one
    # checkpoint-scan aggregate — the r9.0 version's cache+count pair
    # re-ran the growing join chain per level and regressed the bench
    # 6x at fixture scale). Split every HOT SPLITTABLE cell; stop when
    # none remain. Hot = more rows than BOTH the proportional share
    # (> n/B) AND the absolute floor _MIN_SPLIT_ROWS — without the
    # floor, at small n every 4-row cell is "hot" (4*B > 15k) and the
    # loop grinds through levels that cannot matter: a cell a single
    # task sorts in microseconds is not a straggler, whatever its
    # share. At 100 TB n/B dwarfs the floor and behavior is unchanged.
    # A hot cell sub-splits on whichever range still discriminates: a
    # SINGLE-value cell (null-safe compare — the all-NULL sentinel
    # bucket qualifies) orders purely by tie, so it splits on
    # equal-width TIE ranges; a MULTI-value cell splits on equal-width
    # VALUE ranges. Both are monotone in the total order (value asc,
    # tie asc), so cumulative offsets stay exact. Params go back in as
    # a driver-built literal broadcast frame — the final plan carries
    # no stats subtree at all.
    from pyspark.sql import types as T

    keys = ["_bkt"]
    sub_cols: list[str] = []
    spark = df.sparkSession
    for level in range(1, _MAX_SPLIT_LEVELS + 1):
        rows = (
            d.groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min("_v").alias("_bv_lo"),
                F.max("_v").alias("_bv_hi"),
                F.min("_t").alias("_bt_lo"),
                (F.max("_t") - F.min("_t")).alias("_tr"),
                F.first("_tot").alias("_btot"),
            )
            .collect()
        )
        params = []
        for r in rows:
            single = (r["_bv_lo"] is None and r["_bv_hi"] is None) or (
                r["_bv_lo"] is not None and r["_bv_lo"] == r["_bv_hi"]
            )
            hot = (
                r["_c"] * RANK_BUCKETS > r["_btot"]
                and r["_c"] > _MIN_SPLIT_ROWS
            )
            # a pure full-tie cell (tie range NULL or 0) cannot split
            # further — without the guard the loop would spin on it
            splittable = (
                (r["_tr"] is not None and r["_tr"] > 0) if single else True
            )
            if not (hot and splittable):
                continue
            m = min(RANK_BUCKETS, int(r["_c"]) * RANK_BUCKETS // int(r["_btot"]) + 1)
            rng = r["_tr"] if single else (r["_bv_hi"] - r["_bv_lo"])
            sw = int(rng) // m + 1
            base = r["_bt_lo"] if single else r["_bv_lo"]
            params.append(
                tuple(r[k] for k in keys) + (single, int(sw), int(base))
            )
        if not params:
            break
        schema = T.StructType(
            [T.StructField(k, T.LongType()) for k in keys]
            + [
                T.StructField("_single", T.BooleanType()),
                T.StructField("_sw", T.LongType()),
                T.StructField("_base", T.LongType()),
            ]
        )
        # sub-key arithmetic stays in decimal(38,0): _sw/_base are
        # exact integers but can exceed int64 for extreme ranges —
        # guard rather than truncate (the level-0 bucket already
        # raised on >38-digit ranges, so this is the same envelope)
        for p in params:
            if abs(p[-1]) > 2**62 or p[-2] > 2**62:
                raise ValueError(
                    "_rank_bucketed: sub-split range exceeds int64 "
                    "packing envelope"
                )
        pdf = spark.createDataFrame(params, schema)
        d = d.join(F.broadcast(pdf), keys, "left")
        d = d.withColumn(
            "_sk", F.when(F.col("_single"), F.col("_t")).otherwise(F.col("_v"))
        )
        sub = f"_sub{level}"
        d = d.withColumn(
            sub,
            F.when(F.col("_single").isNull(), F.lit(0).cast("bigint"))
            .when(F.col("_sk").isNull(), F.lit(-1).cast("bigint"))
            .otherwise(
                F.expr(
                    "(_sk - CAST(_base AS DECIMAL(38,0)))"
                    " div CAST(_sw AS DECIMAL(38,0))"
                ).cast("bigint")
            ),
        ).drop("_sk", "_single", "_sw", "_base")
        keys.append(sub)
        sub_cols.append(sub)
    # Pack the per-level sub keys into ONE decimal(38,0) by fixed-radix
    # (B+2) positional encoding: digit = sub + 1 in [0, B+1), levels a
    # cell never reached pad as 0 — uniform within the cell, so the
    # packing stays lexicographic ⇒ monotone in the total order.
    radix = RANK_BUCKETS + 2
    if not sub_cols:
        packed = F.lit(0).cast("decimal(38,0)")
    else:
        terms = []
        for i, c in enumerate(sub_cols):
            place = radix ** (len(sub_cols) - 1 - i)
            terms.append(
                f"(CAST(`{c}` AS DECIMAL(38,0)) + 1)"
                f" * CAST('{place}' AS DECIMAL(38,0))"
            )
        packed = F.expr(" + ".join(terms)).cast("decimal(38,0)")
    return d.withColumn("_sub", packed).drop("_t", "_tot", *sub_cols)


def _two_phase_global_rank(
    df: DataFrame, value_col: str, tie_col: str, desc: bool = False
) -> DataFrame:
    """Global row_number under the TOTAL order (value asc|desc, tie asc)
    with no single-partition window — the distributed two-phase rank:

      1. bucket rows by a composite key (value bucket, tie sub-bucket)
         that is monotone in the total order — `_rank_bucketed` above
         (map-side integer math between broadcast bounded stats; NULL
         values ranked NULLS-FIRST asc / NULLS-LAST desc via sentinel
         buckets, matching the Window.orderBy defaults this replaces);
      2. one cumulative window over the BOUNDED composite histogram
         (<= ~2*RANK_BUCKETS rows — constant, never data-sized) yields
         each bucket's start offset and the total n;
      3. row_number partitioned BY COMPOSITE BUCKET (parallel across
         buckets), plus the bucket's offset, is the exact global rank.

    Descending order rides the same machinery with the value negated
    (ties still break ascending on tie_col, matching `ORDER BY v DESC,
    tie ASC`). Adds `_rank` (1-based bigint) and `_n` (total count,
    NULL values included); callers must drop both. value_col must be
    castable to decimal(38,0) — exact, so bucket edges cannot drift
    between runs (not that they need to: any monotone bucketing yields
    the same ranks). Heavily-tied value columns (the customer_rfm
    frequency quintile) no longer funnel each tied value through one
    task: single-value hot buckets sub-split on tie ranges."""
    d = _rank_bucketed(df, value_col, tie_col, desc=desc)
    hist = d.groupBy("_bkt", "_sub").agg(F.count(F.lit(1)).alias("_cnt"))
    w_prev = Window.orderBy("_bkt", "_sub").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_bkt", "_sub").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "_bkt",
        "_sub",
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_start"),
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    d = d.join(F.broadcast(cum), ["_bkt", "_sub"])
    w_cell = Window.partitionBy("_bkt", "_sub").orderBy(
        F.asc("_v"), F.asc(tie_col)
    )
    return (
        d.withColumn(
            "_rank",
            F.row_number().over(w_cell).cast("bigint") + F.col("_start"),
        )
        .drop("_v", "_bkt", "_sub", "_start")
    )


def _ntile_from_rank(k: int) -> Column:
    """ntile(k) computed arithmetically from the exact global `_rank`
    and total `_n` (SQL-standard tiling: the first n%k tiles get
    ceil(n/k) rows, the rest floor(n/k)) — what the built-in would
    produce, without its single-partition sort."""
    q = f"(_n div {k})"
    r = f"(_n % {k})"
    return F.expr(
        f"CASE WHEN _rank <= {r} * ({q} + 1)"
        f" THEN (_rank - 1) div ({q} + 1) + 1"
        f" ELSE {r} + (_rank - {r} * ({q} + 1) - 1) div {q} + 1 END"
    )


def _percent_rank_from_rank() -> Column:
    """percent_rank = (rank-1)/(n-1) — exact because the window order is
    total (rank() == row_number). Same IEEE division of the same exact
    integers the built-in performs."""
    return F.expr(
        "CASE WHEN _n > 1 THEN CAST(_rank - 1 AS DOUBLE)"
        " / CAST(_n - 1 AS DOUBLE) ELSE 0.0D END"
    )


def _cume_dist_from_rank() -> Column:
    """cume_dist = rank/n under a total order (no ties by
    construction)."""
    return F.expr("CAST(_rank AS DOUBLE) / CAST(_n AS DOUBLE)")


DECILES_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000
                  AS HUGEINT)) AS sp6
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       (CAST(sp6 // 1000000 AS DOUBLE)
        + CAST(sp6 % 1000000 AS DOUBLE) / 1000000.0) AS total_spend,
       CAST(ntile(10) OVER w AS INTEGER) AS decile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM spend
WINDOW w AS (ORDER BY sp6, o_custkey)
"""


@query("customer_value_deciles", oracle=DECILES_ORACLE)
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value segmentation: every distribution-ranking window
    function over per-customer lifetime spend — ntile(10) decile,
    percent_rank, cume_dist. Spend totals ride the exact s6 fixed-point
    sum and the window ORDERS BY THE SCALED INTEGER (tie-broken on
    custkey), so row order — which ntile is sensitive to — is
    bit-identical across engines; the rank ratios are then single IEEE
    divisions of identical integers.

    Scale: one map-side-combined groupBy on the high-cardinality
    custkey, then the TWO-PHASE global rank (_two_phase_global_rank:
    bucket histogram -> bounded cumulative offsets -> per-bucket
    row_number + offset) — no single-partition WindowExec anywhere;
    ntile/percent_rank/cume_dist are pure arithmetic over the exact
    (rank, n) pair, reproducing the built-ins' SQL-standard
    definitions bit-for-bit (the r6 plan sorted all customers in ONE
    task; this one's widest sequential step is the bounded composite
    histogram window — tied values sub-split on the tie column, so
    even a constant spend column would stay parallel)."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(s6("o_totalprice")).alias("sp6")
    )
    ranked = _two_phase_global_rank(spend, "sp6", "o_custkey")
    return ranked.select(
        "o_custkey",
        unscale("sp6", 6).alias("total_spend"),
        _ntile_from_rank(10).cast("int").alias("decile"),
        _percent_rank_from_rank().alias("pct_rank"),
        _cume_dist_from_rank().alias("cume"),
    )


# ---------------------------------------------------------------------------
# Per-group 2D skyline (Pareto frontier)
# ---------------------------------------------------------------------------

SKYLINE_ORACLE = """
SELECT b.o_custkey, b.o_orderkey, b.o_totalprice, b.o_orderdate
FROM orders b
WHERE NOT EXISTS (
  SELECT 1 FROM orders a
  WHERE a.o_custkey = b.o_custkey
    AND a.o_totalprice <= b.o_totalprice
    AND a.o_orderdate <= b.o_orderdate
    AND (a.o_totalprice < b.o_totalprice OR a.o_orderdate < b.o_orderdate)
)
"""


@query("skyline_orders", oracle=SKYLINE_ORACLE)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer Pareto frontier over (price, date), both minimized:
    an order survives iff no other order by the same customer is at
    least as cheap AND at least as early, strictly better in one — the
    dominance/skyline operator ("show me the orders that were not
    beaten on both axes").

    The oracle is the textbook correlated NOT EXISTS — quadratic per
    group. The engine's plan is the 2D-skyline classic instead: collapse
    ties to one row per (customer, price) carrying that price level's
    min date, take the running min of earlier (strictly cheaper) levels'
    dates under a price-ordered window, and read dominance off two
    scalar comparisons: dominated iff some cheaper level has date <=
    mine (prev_min <= d) or my own price level has a strictly earlier
    date (dmin < d). Linear work per group after one sort.

    Scale: the collapse, the window, and the join-back all share the
    o_custkey hash partitioning (the groupBy adds o_totalprice, a
    refinement; AQE reuses the exchange) — customer is high-cardinality
    and per-customer order counts are bounded, so no skew. All
    comparisons are raw column values (double/int64-microsecond),
    bit-identical in both engines; no arithmetic is performed at all.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    lvl = o.groupBy("o_custkey", "o_totalprice").agg(
        F.min("o_orderdate").alias("dmin")
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lvl = lvl.withColumn("prev_min", F.min("dmin").over(w_prev))
    return (
        o.join(lvl, ["o_custkey", "o_totalprice"])
        .where(
            (F.col("prev_min").isNull() | (F.col("prev_min") > F.col("o_orderdate")))
            & (F.col("dmin") == F.col("o_orderdate"))
        )
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
    )


GROUPING_SETS_ORACLE = """
SELECT o_orderpriority,
       year(o_orderdate) AS y,
       CAST(CASE WHEN o_orderpriority IS NULL AND year(o_orderdate) IS NULL
                 THEN 3
                 WHEN o_orderpriority IS NULL THEN 2
                 WHEN year(o_orderdate) IS NULL THEN 1
                 ELSE 0 END AS INTEGER) AS gid,
       count(*) AS n_orders,
       (CAST((sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) // 1000000 AS DOUBLE) + CAST((sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))) % 1000000 AS DOUBLE) / 1000000.0) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (year(o_orderdate)), ())
"""


@query("priority_sets", oracle=GROUPING_SETS_ORACLE)
def priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((priority), (year), ()) with a
    grouping_id discriminator — the third member of the grouping
    trio (priority_rollup = ROLLUP, order_date_cube = CUBE), needed
    whenever the wanted sets are NEITHER a prefix hierarchy nor the
    full lattice: here two independent 1-D marginals plus the grand
    total, skipping the (priority, year) cross that CUBE would pay
    for.

    gid disambiguates "NULL because aggregated away" from a (possible)
    NULL group value; the oracle derives the same discriminator from
    the NULL pattern (safe here: neither column is nullable in the
    fixture, mirrored exactly either way). Scale: one Expand (3x) +
    one hash-agg shuffle, no repeated scans — the same cost shape as
    rollup/cube, minus the lattice sets not asked for."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("y"),
        "o_totalprice",
    )
    return (
        o.groupingSets(
            [["o_orderpriority"], ["y"], []], "o_orderpriority", "y"
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(s6("o_totalprice")).alias("_tot"),
        )
        .select(
            "o_orderpriority",
            "y",
            "gid",
            "n_orders",
            unscale("_tot", 6).alias("sum_total"),
        )
    )


# ---------------------------------------------------------------------------
# Approximate query processing with error bars (BlinkDB-style)
# ---------------------------------------------------------------------------

AQP_INV_P = 64  # Bernoulli sampling rate p = 1/64 (power of two: the
#                 60-bit hash threshold 2^60/64 = 2^54 is EXACT)
_AQP_TH = (16**15) // AQP_INV_P


AQP_ORACLE = f"""
WITH s AS (
  SELECT o_orderpriority, o_totalprice FROM orders
  WHERE CAST(('0x' || substr(md5('aqp|' || CAST(o_orderkey AS VARCHAR)),
                             1, 15)) AS BIGINT) < {_AQP_TH}
),
agg AS (
  SELECT o_orderpriority,
         count(*) AS n_sampled,
         sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
             AS s1,
         sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT)
             * CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
             AS s2
  FROM s GROUP BY o_orderpriority
)
SELECT o_orderpriority, n_sampled,
       (CAST(s1 // 1000000 AS DOUBLE)
        + CAST(s1 % 1000000 AS DOUBLE) / 1000000.0) * {AQP_INV_P}
           AS est_total,
       sqrt((CAST(s2 // 1000000000000 AS DOUBLE)
             + CAST(s2 % 1000000000000 AS DOUBLE) / 1000000000000.0)
            * {AQP_INV_P}.0 * {AQP_INV_P - 1}.0) AS stderr
FROM agg
"""


@query("aqp_revenue", oracle=AQP_ORACLE)
def aqp_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate total revenue per order priority with an error bar,
    from a 1/{AQP_INV_P} seeded-hash Bernoulli sample (BlinkDB-style
    AQP): est = sum(sample)/p (Horvitz-Thompson, unbiased) and
    stderr = sqrt((1/p)(1/p - 1) * sum(sample x^2)) — the plug-in
    variance of the HT estimator under Bernoulli sampling. The whole
    point at 100 TB: the scan touches 1/{AQP_INV_P} of the rows (at
    scale, a pre-materialized sample table partition-prunes the rest)
    and the answer carries its own uncertainty.

    Determinism/exactness: membership is the engine's seeded md5
    idiom with a POWER-OF-TWO rate, so the 60-bit threshold is exact;
    both moment sums are exact scaled integers (1e6 / 1e12), and the
    only floats are the final unscale-multiply and one
    correctly-rounded sqrt — identical IEEE expressions in both
    engines, so even the error bar hash-compares. The pytest checks
    the estimate covers the true total within 4 stderr per group.

    Scale: one pushed-filter scan + one low-cardinality groupBy with
    map-side combine; no joins, no windows.
    """
    o = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.format_string("aqp|%d", F.col("o_orderkey"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    v6 = s6("o_totalprice")
    agg = (
        o.where(h < F.lit(_AQP_TH))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(v6).alias("s1"),
            F.sum(v6 * v6).alias("s2"),
        )
    )
    return agg.select(
        "o_orderpriority",
        "n_sampled",
        (unscale("s1", 6) * AQP_INV_P).alias("est_total"),
        F.sqrt(
            unscale("s2", 12) * float(AQP_INV_P) * float(AQP_INV_P - 1)
        ).alias("stderr"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------

RFM_ORACLE = """
WITH base AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         sum(CAST(CAST(o_totalprice AS DECIMAL(12,6)) * 1000000 AS HUGEINT))
             AS monetary_e6
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, last_order, frequency,
       (CAST(monetary_e6 // 1000000 AS DOUBLE)
        + CAST(monetary_e6 % 1000000 AS DOUBLE) / 1000000.0) AS monetary,
       CAST(ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS INTEGER)
           AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER)
           AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary_e6 DESC, o_custkey) AS INTEGER)
           AS m_score
FROM base
"""


@query("customer_rfm", oracle=RFM_ORACLE)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (last order date),
    frequency (order count), monetary (exact total spend), each
    quintiled 1-5 — the classic marketing segmentation (1/1/1 = best).

    Determinism: every ntile orders by an exact column (timestamp /
    bigint / scaled-integer spend) with o_custkey as the total-order
    tie-break, so quintile boundaries cannot drift between engines
    (customer_value_deciles' rule, three times over).

    Scale: each quintile is the TWO-PHASE global rank (composite
    bucket histogram -> bounded offsets -> per-bucket row_number) plus
    the arithmetic ntile — three bounded-histogram passes chained on
    the per-customer aggregate, zero single-partition sorts (the r6
    plan ran three global ntile windows in one task each). The
    frequency quintile ranks a ~low-cardinality count column whose
    tied values all land in one value bucket — the tie sub-split on
    o_custkey keeps those buckets near n/RANK_BUCKETS rows instead of
    one task per tied value (the r7 skew residual). Descending orders
    ride the same machinery with the value negated."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(s6("o_totalprice")).alias("monetary_e6"),
    )
    d = base.withColumn("_lo_us", F.unix_micros("last_order"))
    d = _two_phase_global_rank(d, "_lo_us", "o_custkey", desc=True)
    d = d.withColumn("r_score", _ntile_from_rank(5).cast("int")).drop(
        "_rank", "_n", "_lo_us"
    )
    d = _two_phase_global_rank(d, "frequency", "o_custkey", desc=True)
    d = d.withColumn("f_score", _ntile_from_rank(5).cast("int")).drop(
        "_rank", "_n"
    )
    d = _two_phase_global_rank(d, "monetary_e6", "o_custkey", desc=True)
    return d.select(
        "o_custkey",
        "last_order",
        "frequency",
        unscale("monetary_e6", 6).alias("monetary"),
        "r_score",
        "f_score",
        _ntile_from_rank(5).cast("int").alias("m_score"),
    )


# ---------------------------------------------------------------------------
# DAU / WAU / stickiness (rolling distinct actives)
# ---------------------------------------------------------------------------

DAU_WAU_ORACLE = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du),
dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
wau AS (
  SELECT d.day, count(DISTINCT u.user_id) AS wau
  FROM days d JOIN du u
    ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
  GROUP BY d.day
)
SELECT d.day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
FROM days d JOIN dau ON dau.day = d.day JOIN wau ON wau.day = d.day
"""


@query("dau_wau", oracle=DAU_WAU_ORACLE)
def dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives, trailing-7-day actives, and stickiness
    (DAU/WAU) per active day — the growth dashboard's first page.

    The WAU rolling distinct cannot use a window frame (COUNT
    DISTINCT over a range frame isn't supported and would re-scan
    anyway), and the oracle's interval join is quadratic in days.
    The engine instead EXPLODES each (day, user) activity row onto
    the <= 7 window days it contributes to (map-side, bounded x7)
    and counts distinct users per window day — the standard
    "contribute to every window you're in" trick that turns a
    rolling distinct into one groupBy. Extra window days past the
    last active day are clipped by the semi-join back to real days.

    Scale: activity first reduces to DISTINCT (day, user) — one
    shuffle keyed by the pair — then the x7 fanout and the count
    shuffle on day; stickiness is one shared IEEE division.
    """
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        ).distinct()
    )
    du = track_cache(du)
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = du.select(
        F.explode(
            F.expr(
                "transform(sequence(0, 6),"
                " i -> timestampadd(DAY, i, day))"
            )
        ).alias("day"),
        "user_id",
    )
    wau = (
        contrib.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# A/B conversion analysis with z-statistic
# ---------------------------------------------------------------------------

AB_TEST_ORACLE = """
WITH assign AS (
  SELECT DISTINCT user_id,
         CASE WHEN CAST(('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant
  FROM events
),
conv AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND value > 100
),
arms AS (
  SELECT a.variant, count(*) AS n_users,
         sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS n_converted
  FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
  GROUP BY a.variant
),
w AS (
  SELECT
    (SELECT n_users FROM arms WHERE variant = 'A') AS na,
    (SELECT n_converted FROM arms WHERE variant = 'A') AS ca,
    (SELECT n_users FROM arms WHERE variant = 'B') AS nb,
    (SELECT n_converted FROM arms WHERE variant = 'B') AS cb
)
SELECT na AS n_a, CAST(ca AS BIGINT) AS conv_a,
       nb AS n_b, CAST(cb AS BIGINT) AS conv_b,
       CAST(ca AS DOUBLE) / na AS rate_a,
       CAST(cb AS DOUBLE) / nb AS rate_b,
       (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
         / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                * (1.0 / na + 1.0 / nb)) AS z_score
FROM w
"""


@query("ab_test_conversion", oracle=AB_TEST_ORACLE)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B conversion analysis: users split into
    variants by the seeded-hash assignment (md5 parity — the
    reproducible, engine-independent randomization every experiment
    platform uses), conversion = the user ever made a >100-unit
    purchase (every fixture user purchases SOMETHING, which would
    degenerate the pooled rate to 1 and the z denominator to 0), and
    the pooled two-proportion z-statistic — the experiment readout, as
    one query.

    Exactness: counts are exact; rates and z are a fixed IEEE
    expression tree (divisions + one correctly-rounded sqrt) written
    token-for-token in both engines, so even the z-score
    hash-compares. Scale: distinct-first on (user) then one
    low-cardinality groupBy; the final 1-row pivot is driver-free
    (conditional aggregation over 2 rows).
    """
    ev = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.conv(
            F.substring(
                F.md5(F.format_string("ab|%d", F.col("user_id"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    assign = ev.select("user_id").distinct().select("user_id", variant.alias("variant"))
    conv = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 100))
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    arms = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0))).alias(
                "n_converted"
            ),
        )
    )
    w = arms.agg(
        F.sum(F.when(F.col("variant") == "A", F.col("n_users"))).alias("na"),
        F.sum(F.when(F.col("variant") == "A", F.col("n_converted"))).alias("ca"),
        F.sum(F.when(F.col("variant") == "B", F.col("n_users"))).alias("nb"),
        F.sum(F.when(F.col("variant") == "B", F.col("n_converted"))).alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na")
    rb = F.col("cb").cast("double") / F.col("nb")
    pooled = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    return w.select(
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        (
            (ra - rb)
            / F.sqrt(
                pooled
                * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
            )
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Ranking-function surface completion: rank / dense_rank / first_value /
# nth_value (the window functions no other query exercises)
# ---------------------------------------------------------------------------

BALANCE_RANKS_ORACLE = """
SELECT s_nationkey, s_suppkey,
       CAST(floor(s_acctbal / 1000) AS BIGINT) AS bracket,
       CAST(rank() OVER w1 AS INTEGER) AS rk,
       CAST(dense_rank() OVER w1 AS INTEGER) AS drk,
       first_value(s_suppkey) OVER w2 AS top_suppkey,
       nth_value(s_suppkey, 2) OVER w2 AS second_suppkey
FROM supplier
WINDOW
  w1 AS (PARTITION BY s_nationkey ORDER BY floor(s_acctbal / 1000) DESC),
  w2 AS (PARTITION BY s_nationkey
         ORDER BY floor(s_acctbal / 1000) DESC, s_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("supplier_balance_ranks", oracle=BALANCE_RANKS_ORACLE)
def supplier_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier leaderboard over COARSE balance brackets
    (floor(acctbal/1000) — coarse so ties actually occur), exercising
    the last unexercised window functions: rank and dense_rank over
    the TIED order (their whole point — rk gaps after tie groups, drk
    does not), first_value and nth_value(2) over the tie-broken TOTAL
    order (deterministic leaders; second_suppkey is NULL until the
    frame reaches position 2 — identical default in both engines,
    pinned with an explicit ROWS frame).

    Exactness: the bracket is one shared IEEE divide+floor of the same
    double; everything else is copied integers. Scale: two Window
    nodes, both partitioned on s_nationkey and sharing one exchange —
    rank brackets are per-nation bounded; no global windows."""
    s = load_table(spark, sf_dir, "supplier")
    bracket = F.floor(F.col("s_acctbal") / 1000)
    w1 = Window.partitionBy("s_nationkey").orderBy(F.desc(bracket))
    w2 = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.desc(bracket), F.asc("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return s.select(
        "s_nationkey",
        "s_suppkey",
        bracket.cast("bigint").alias("bracket"),
        F.rank().over(w1).cast("int").alias("rk"),
        F.dense_rank().over(w1).cast("int").alias("drk"),
        F.first("s_suppkey").over(w2).alias("top_suppkey"),
        F.nth_value("s_suppkey", 2).over(w2).alias("second_suppkey"),
    )
