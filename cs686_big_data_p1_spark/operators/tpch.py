"""Extended TPC-H-style relational coverage (SURVEY.md §2.I E6).

Eight more TPC-H-shaped pipelines over the driver fixture tables,
adapted to the fixture's schema subset (no partsupp, no
shipmode/receiptdate/phone columns — predicates that need them are
re-targeted onto columns that exist, noted per query). Together with
operators/analytics.py this covers the classic relational surface:
scalar aggregates (q6), nation-pair join graphs (q7), ratio-of-sums
market share (q8), group-then-rank reporting (q10), outer-join
histograms (q13), ratio aggregates over a join (q14), HAVING
semi-joins (q18), disjunctive join predicates (q19), and
anti-join + scalar subquery (q22).

Numeric policy is operators/analytics.py's: monetary sums are exact
1e6-scaled decimal(38,0) integers (HUGEINT oracle-side), converted to
double once via the shared ``unscale`` quotient/remainder split;
ratios divide two such doubles with identical operand order in both
engines, so results are ulp-exact and hash-comparable.

Scale notes (100 TB): region/nation are the only broadcast sides;
part, supplier, customer, orders, lineitem all shuffle on their join
keys (each scales with SF — broadcasting part at sf0.01 would be a
plan that dies at sf1000). Filters and projections push to the
parquet scans; every aggregate is partial+final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, track_cache
from ..tables import load_table
from .analytics import disc_factor, rev_sum, s6, unscale

# Exact-revenue SQL fragments shared by the oracles below (the same
# expansion Q1_ORACLE/Q3_ORACLE use; DuckDB HUGEINT = Spark decimal(38,0)).
_S6 = "CAST(CAST({c} AS DECIMAL(12,6)) * 1000000 AS HUGEINT)"
_REV_TERM = f"{_S6.format(c='l_extendedprice')} * (1000000 - {_S6.format(c='l_discount')})"


def _unscale_sql(expr: str, pow10: int) -> str:
    sc = 10**pow10
    return (
        f"(CAST(({expr}) // {sc} AS DOUBLE)"
        f" + CAST(({expr}) % {sc} AS DOUBLE) / {sc}.0)"
    )


_REV_SUM_SQL = _unscale_sql(f"sum({_REV_TERM})", 12)


Q6_ORACLE = f"""
SELECT {_unscale_sql(f"sum({_S6.format(c='l_extendedprice')} * {_S6.format(c='l_discount')})", 12)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6_forecast", oracle=Q6_ORACLE)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast-revenue: pure scan + filter + one scalar aggregate.

    Scale: the canonical predicate-pushdown benchmark — all three
    filters and the 4-column projection reach the parquet scan
    (PushedFilters), the sum is map-side partial, and the shuffle
    carries one 16-byte decimal per input partition. No join, no
    wide shuffle; this query is scan-bandwidth-bound at any SF.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(s6("l_extendedprice") * s6("l_discount")).alias("_rev"))
        .select(unscale("_rev", 12).alias("revenue"))
    )


Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {_REV_SUM_SQL} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


@query("tpch_q7_volume", oracle=Q7_ORACLE)
def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between a nation pair, by ship year.

    Scale: nation is broadcast twice under different aliases (25 rows
    at any SF). supplier and customer shuffle-join their facts; the
    disjunctive nation-pair predicate is applied after both nation
    joins, where it prunes to the 2x2 pair before the group-by. The
    shipdate range pushes to the lineitem scan.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(rev_sum().alias("_rev"))
        .select(
            "supp_nation", "cust_nation", "l_year", unscale("_rev", 12).alias("revenue")
        )
    )


Q8_ORACLE = f"""
SELECT o_year,
       ({_unscale_sql(f"sum(CASE WHEN supp_nation = 'NATION_3' THEN {_REV_TERM} ELSE 0 END)", 12)})
       / ({_REV_SUM_SQL}) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year, l_extendedprice, l_discount,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
)
GROUP BY o_year
"""


@query("tpch_q8_marketshare", oracle=Q8_ORACLE)
def tpch_q8_marketshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 market share: one nation's fraction of regional promo revenue
    per order year — a ratio of two exact sums over a 7-table join.

    Scale: region + both nation aliases broadcast; part (filtered to
    p_type='PROMO' at the scan), supplier, customer, orders shuffle
    on their keys. The numerator is a conditional sum in the SAME
    aggregation pass as the denominator (no second scan, no
    self-join); both stay exact decimal until the single final
    division, so the share is ulp-identical to DuckDB's.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    vol = s6("l_extendedprice") * disc_factor()
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_rkey") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
            ).alias("_num"),
            rev_sum().alias("_den"),
        )
        .select(
            "o_year",
            (unscale("_num", 12) / unscale("_den", 12)).alias("mkt_share"),
        )
    )


Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_REV_SUM_SQL} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@query("tpch_q10_returns", oracle=Q10_ORACLE)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by lost revenue in
    a quarter. (The fixture has no c_phone/c_address/c_comment, so the
    output keeps the remaining report columns.)

    Scale: nation broadcasts; customer><orders and orders><lineitem
    shuffle on their keys. The quarter filter pushes to the orders
    scan and the returnflag filter to the lineitem scan, so the join
    probes are pre-shrunk. TakeOrderedAndProject keeps only 20 rows
    per partition; revenue stays exact decimal so the DESC order and
    the oracle's agree exactly (c_custkey breaks revenue ties).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev_sum().alias("_rev"))
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "n_name",
            unscale("_rev", 12).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@query("tpch_q13_custdist", oracle=Q13_ORACLE)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: outer join preserved rows
    feed a two-level aggregation. (The fixture has no o_comment; the
    canonical NOT LIKE '%special%requests%' filter is re-targeted to
    o_orderpriority <> '1-URGENT' — same shape: a join-side filter
    that must NOT drop order-less customers.)

    Scale: the filter lives in the join condition, not a WHERE (a
    WHERE would turn the outer join inner and lose zero-order
    customers). First aggregation shuffles on c_custkey — same key as
    the join, so AQE reuses the partitioning; the second groups by
    c_count (small domain) after a map-side partial agg has already
    collapsed each partition to its distinct counts.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q14_ORACLE = f"""
SELECT (100.0 * ({_unscale_sql(f"sum(CASE WHEN p_type = 'PROMO' THEN {_REV_TERM} ELSE 0 END)", 12)}))
       / ({_REV_SUM_SQL}) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""


@query("tpch_q14_promo", oracle=Q14_ORACLE)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promo-revenue percentage for one ship month.

    Scale: part scales with SF, so it shuffle-joins on partkey (AQE
    may downgrade to broadcast at toy SF — the declared plan must not
    assume it). One aggregation computes numerator and denominator
    together; the month filter pushes to the lineitem scan, shrinking
    the join's probe side ~60x. The 100.0 multiply happens before
    the divide in both engines (left-assoc), keeping ulp parity.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = s6("l_extendedprice") * disc_factor()
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).alias(
                "_num"
            ),
            rev_sum().alias("_den"),
        )
        .select(
            ((F.lit(100.0) * unscale("_num", 12)) / unscale("_den", 12)).alias(
                "promo_revenue"
            )
        )
    )


_QTY_SUM = f"sum({_S6.format(c='l_quantity')})"

Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       {_unscale_sql(_QTY_SUM, 6)} AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING {_QTY_SUM} > 150000000
"""


@query("tpch_q18_bigorders", oracle=Q18_ORACLE)
def tpch_q18_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume orders: orders whose total quantity exceeds 150,
    with their customer. The canonical IN (GROUP BY ... HAVING)
    subquery is decorrelated: aggregate lineitem by order FIRST, keep
    the heavy orders, then join the (now tiny) survivors to orders
    and customer.

    Scale: this order matters — aggregating before joining shrinks
    the lineitem side from ~4 rows/order to <<1 surviving row/order
    before any wide table moves. The HAVING compares exact scaled
    integers (no double threshold ambiguity). Both remaining joins
    shuffle on their keys.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    heavy = (
        l.groupBy("l_orderkey")
        .agg(F.sum(s6("l_quantity")).alias("_qty"))
        .where(F.col("_qty") > F.lit(150_000_000).cast("decimal(38,0)"))
    )
    return (
        heavy.join(o, heavy.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            unscale("_qty", 6).alias("sum_qty"),
        )
    )


Q19_ORACLE = f"""
SELECT {_REV_SUM_SQL} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@query("tpch_q19_brackets", oracle=Q19_ORACLE)
def tpch_q19_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under a disjunction of brand/size/quantity
    brackets. (The fixture has no p_container/l_shipinstruct; the
    disjunction keeps the canonical brand + size + quantity arms.)

    Scale: the join key (p_partkey = l_partkey) is an equi-join with
    the OR-of-ANDs as a residual filter — Catalyst must NOT fall back
    to a cartesian product. Derivable single-side conjuncts (brand IN,
    size <= 15, quantity <= 30) are pushed to each scan; the exact
    residual applies at the join. Part shuffles (it scales with SF).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    arm1 = (F.col("p_brand") == "Brand#12") & size.between(1, 5) & qty.between(1, 11)
    arm2 = (F.col("p_brand") == "Brand#23") & size.between(1, 10) & qty.between(10, 20)
    arm3 = (F.col("p_brand") == "Brand#34") & size.between(1, 15) & qty.between(20, 30)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(arm1 | arm2 | arm3)
        .agg(rev_sum().alias("_rev"))
        .select(unscale("_rev", 12).alias("revenue"))
    )


_BAL_SUM = f"sum({_S6.format(c='c_acctbal')})"

Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT {_unscale_sql(_BAL_SUM, 6)} / count(*) AS avg_acctbal
  FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
)
SELECT c_nationkey, count(*) AS numcust,
       {_unscale_sql(_BAL_SUM, 6)} AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
  AND c_acctbal > avg_acctbal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


@query("tpch_q22_prospects", oracle=Q22_ORACLE)
def tpch_q22_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: customers in a 7-nation set with
    above-average balances and no urgent orders. (The fixture has no
    c_phone, and every fixture customer has at least one order, so the
    country-code substring predicate is re-targeted to c_nationkey
    IN (...) and the anti-join to urgent orders — same shape: a set
    filter + scalar-subquery threshold + NOT EXISTS anti-join.)

    Scale: the scalar average is a 1-row aggregate broadcast into a
    cross join (no driver round-trip, stays in the plan); the NOT
    EXISTS is a left-anti shuffle join on custkey against orders
    projected to its key column only. unscale()'s nonnegativity
    precondition holds: the average is over strictly positive
    balances, and every selected balance exceeds that average.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7)
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.sum(s6("c_acctbal")).alias("_bal"), F.count(F.lit(1)).alias("_n"))
        .select((unscale("_bal", 6) / F.col("_n")).alias("avg_acctbal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_acctbal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(s6("c_acctbal")).alias("_bal"),
        )
        .select("c_nationkey", "numcust", unscale("_bal", 6).alias("totacctbal"))
    )


# --- round-6 additions: the remaining TPC-H shapes expressible over
# the fixture schema subset (Q2/Q9/Q11/Q16/Q20 need partsupp, which
# the fixture does not ship). Adapted predicates noted per query.

Q12_ORACLE = """
SELECT l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


@query("tpch_q12_shipmode", oracle=Q12_ORACLE)
def tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority histogram, adapted: the fixture has
    no l_shipmode/l_commitdate/l_receiptdate, so the mode class is
    l_returnflag and "late" is shipped more than 60 days after the
    order date. Shape preserved: fact-fact equi-join + conditional
    count aggregation (CASE inside sum), integer-exact so the oracle
    hash-matches trivially.

    Scale: the shipdate range pushes to the lineitem scan; the join
    shuffles on orderkey; the group-by has 3 keys — partial aggs
    collapse nearly everything map-side.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, sum({_REV_TERM}) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {_unscale_sql("r", 12)} AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM rev)
"""


@query("tpch_q15_topsupplier", oracle=Q15_ORACLE)
def tpch_q15_topsupplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: quarterly revenue per supplier, keep the
    supplier(s) achieving the maximum (the view + scalar-subquery-max
    shape, decorrelated as agg -> broadcast 1-row max -> filter).

    Tie-safety: the equality test runs on the exact 1e12-scaled
    integer revenue (decimal/HUGEINT), not the unscaled double, so
    both engines select the identical supplier set even when two
    totals differ below double precision.

    Scale: one shuffle on l_suppkey for the aggregate; the 1-row max
    is broadcast; supplier joins on its key. No window over the full
    aggregate — the max is a scalar, not a rank.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(rev_sum().alias("_rev"))
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("_rev") == F.col("_mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", unscale("_rev", 12).alias("total_revenue"))
    )


Q17_ORACLE = f"""
WITH qstats AS (
  SELECT l_partkey,
         sum({_S6.format(c='l_quantity')}) AS qsum,
         count(*) AS qn
  FROM lineitem GROUP BY l_partkey
)
SELECT {_unscale_sql(f"sum({_S6.format(c='l_extendedprice')})", 6)} / 7.0
           AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN qstats USING (l_partkey)
WHERE p_brand = 'Brand#1'
  AND 5 * {_S6.format(c='l_quantity')} * qn < qsum
"""


@query("tpch_q17_smallqty", oracle=Q17_ORACLE)
def tpch_q17_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue, adapted: the fixture has no
    p_container, so the part predicate is p_brand alone. The
    correlated "l_quantity < 0.2 * avg(l_quantity) per part" subquery
    is decorrelated into a per-part (sum, count) aggregate and the
    threshold test is cross-multiplied to exact integers
    (5 * qty * n < sum), so the boundary cannot drift between
    engines' float division.

    Scale: the per-part stats shuffle on l_partkey — the same key the
    probe join uses, so AQE can reuse the exchange; the final
    aggregate is a 1-row scalar. part scales with SF and therefore
    shuffle-joins (never broadcast-hinted).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    qstats = l.groupBy("l_partkey").agg(
        F.sum(s6("l_quantity")).alias("qsum"),
        F.count(F.lit(1)).alias("qn"),
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(qstats, "l_partkey")
        .where(
            s6("l_quantity") * F.lit(5).cast("decimal(38,0)") * F.col("qn")
            < F.col("qsum")
        )
        .agg(F.sum(s6("l_extendedprice")).alias("_s"))
        .select((unscale("_s", 6) / F.lit(7.0)).alias("avg_yearly"))
    )


Q21_ORACLE = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("tpch_q21_waiting", oracle=Q21_ORACLE)
def tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting, adapted: "late" is
    shipped more than 90 days after the order date (no
    l_commitdate/l_receiptdate in the fixture). Shape preserved —
    the classic EXISTS + NOT EXISTS double-correlation: the supplier
    was late on a finished multi-supplier order AND was the ONLY late
    supplier on it. Decorrelated as a left-semi join (some other
    supplier on the order) and a left-anti join (no other late
    supplier), both equi on l_orderkey with the supplier-inequality
    as a residual condition.

    Top-10 is deterministic: s_name is unique per supplier and the
    sort is total on (numwait DESC, s_name).

    Scale: `late` is computed once and reused for both the probe and
    the anti side (track_cache); all joins shuffle on
    l_orderkey/l_suppkey ints; the LIMIT runs as
    TakeOrderedAndProject after a 1-key aggregate.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    s = load_table(spark, sf_dir, "supplier")
    late = track_cache(
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = l.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    l1 = late.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        l1.join(s, l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q2 / Q9 / Q11 / Q16 / Q20 — the five partsupp-centric queries, completing
# 22/22 TPC-H coverage. The fixture ships no partsupp table, so the
# part-supplier relationship is DERIVED from lineitem (the pairs that
# actually traded) and ps_supplycost is proxied by the minimum unit price
# the supplier ever charged for the part (min(l_extendedprice/l_quantity);
# both engines evaluate the identical IEEE binary64 division, so the min
# and the equality test against it are bit-exact cross-engine). Remaining
# partsupp columns are re-targeted per query and noted in each docstring.
# ---------------------------------------------------------------------------

_COST_SQL = """
  SELECT l_partkey AS c_partkey, l_suppkey AS c_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
"""

Q2_ORACLE = f"""
WITH cost AS ({_COST_SQL}),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
ce AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost,
         min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM cost
  JOIN eu ON c_suppkey = s_suppkey
  JOIN part ON c_partkey = p_partkey
  WHERE p_size <= 15 AND p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       unit_cost AS supply_cost
FROM ce WHERE unit_cost = min_cost
"""


@query("tpch_q2_mincost", oracle=Q2_ORACLE)
def tpch_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier, adapted: partsupp is derived from
    lineitem trades and ps_supplycost is the min unit price (module
    note above); the part predicate (p_size = N AND p_type LIKE
    '%BRASS') becomes p_size <= 15 AND p_type = 'LARGE' on the
    fixture's columns. The correlated "cost = (SELECT min(cost) ...)"
    subquery is decorrelated as a window min over p_partkey — one
    sort-shuffle instead of the aggregate-plus-self-join's two.

    Scale: region/nation are the only broadcast sides (O(1) rows at
    any SF); the derived cost table shuffles on (partkey, suppkey),
    the supplier join on suppkey, and the part filter lands before
    the window so the window input is already pruned. supplier and
    part scale with SF and are never broadcast-hinted.
    """
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    cost = l.groupBy(
        F.col("l_partkey").alias("c_partkey"),
        F.col("l_suppkey").alias("c_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ce = (
        cost.join(eu, F.col("c_suppkey") == F.col("s_suppkey"))
        .join(p, F.col("c_partkey") == p.p_partkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_cost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ce.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("unit_cost").alias("supply_cost"),
        )
    )


# Q9 profit: supply cost is proxied by p_retailprice * l_quantity (the
# fixture's only per-part cost-like column). Profit can go negative, so
# the nonnegative-only `unscale` helper is applied to the revenue and
# cost sums SEPARATELY and the subtraction happens in double with
# identical operand order in both engines (ulp-exact).
_COST_TERM = f"{_S6.format(c='p_retailprice')} * {_S6.format(c='l_quantity')}"

Q9_ORACLE = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {_unscale_sql(f"sum({_REV_TERM})", 12)}
         - {_unscale_sql(f"sum({_COST_TERM})", 12)} AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


@query("tpch_q9_profit", oracle=Q9_ORACLE)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit, adapted: parts matching a color word
    (p_name LIKE '%red%', standing in for '%green%'), profit =
    revenue - p_retailprice * l_quantity (module note above), grouped
    by supplier nation x order year. The widest join tree in the
    suite: lineitem x orders x supplier x nation x part.

    Scale: lineitem shuffles once per fact-fact join key (orderkey,
    then suppkey/partkey sides); nation broadcasts; part is filtered
    by the name predicate before the join but still shuffle-joins
    (it scales with SF). Both money sums are exact 1e12-scaled
    decimals unscaled only at the final projection.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(s6("l_extendedprice") * disc_factor()).alias("_rev"),
            F.sum(s6("p_retailprice") * s6("l_quantity")).alias("_cost"),
        )
        .select(
            "nation",
            "o_year",
            (unscale("_rev", 12) - unscale("_cost", 12)).alias("sum_profit"),
        )
    )


Q11_ORACLE = f"""
WITH asu AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
v AS (
  SELECT l_partkey,
         sum({_S6.format(c='l_extendedprice')} * CAST(l_quantity AS BIGINT)) AS val
  FROM lineitem JOIN asu ON l_suppkey = s_suppkey
  GROUP BY l_partkey
),
t AS (SELECT sum(val) AS total FROM v)
SELECT l_partkey, {_unscale_sql('val', 6)} AS part_value
FROM v, t WHERE val * 1000 > total
"""


@query("tpch_q11_stockvalue", oracle=Q11_ORACLE)
def tpch_q11_stockvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock, adapted: stock value per part is the sum of
    l_extendedprice * l_quantity over lineitems shipped by ASIA-region
    suppliers (standing in for ps_supplycost * ps_availqty in GERMANY),
    keeping parts whose value exceeds 1/1000 of the region total. The
    scalar HAVING subquery is decorrelated as a 1-row aggregate
    broadcast over the per-part values; the threshold test is the
    exact integer cross-multiplication val * 1000 > total — no float
    boundary drift between engines.

    Scale: one shuffle on l_suppkey (region semi-join), one on
    l_partkey (value aggregate), then the broadcast scalar filter.
    The 1-row total is the only crossJoin, matching the engine's
    bounded-broadcast waiver pattern (tpch_q15/q22).
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    v = (
        l.join(asu, l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                s6("l_extendedprice") * F.col("l_quantity").cast("long")
            ).alias("val")
        )
    )
    t = v.agg(F.sum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(t))
        .where(F.col("val") * F.lit(1000).cast("decimal(38,0)") > F.col("total"))
        .select("l_partkey", unscale("val", 6).alias("part_value"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND NOT EXISTS (SELECT 1 FROM supplier
                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("tpch_q16_partcount", oracle=Q16_ORACLE)
def tpch_q16_partcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship, adapted: the part-supplier
    pairs come from lineitem trades; the excluded-supplier subquery
    (comment LIKE '%Customer%Complaints%') becomes s_acctbal < 0 on
    the fixture's columns, expressed as an anti-join (NOT EXISTS
    oracle-side — null-safe, unlike NOT IN). Distinct supplier count
    per (brand, type, size) descriptor.

    Scale: part is filtered before the join (predicate pushdown on
    brand/type/size); the anti-join's right side is the filtered
    supplier keys (small after the filter — AQE picks broadcast, but
    correct as a shuffle at any size); countDistinct expands to a
    two-phase aggregate shuffling (descriptor, suppkey) then the
    descriptor — both keys low-skew.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(bad, l.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q20_ORACLE = """
WITH qty AS (
  SELECT l_partkey, l_suppkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate <  TIMESTAMP '1997-01-01'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS q96,
         sum(CAST(l_quantity AS BIGINT)) AS qall
  FROM lineitem GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT l_suppkey FROM qty
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'hot%' AND q96 * 10 > qall * 3
)
SELECT s_name, s_acctbal FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND EXISTS (SELECT 1 FROM cand WHERE l_suppkey = s_suppkey)
"""


@query("tpch_q20_promotion", oracle=Q20_ORACLE)
def tpch_q20_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion, adapted: "ps_availqty > 0.5 *
    qty shipped in the year" becomes "1996 shipped quantity > 30% of
    all-time shipped quantity" per (part, supplier) — the same nested
    aggregate-threshold-semi-join shape on the fixture's columns —
    over parts named 'hot%' (for 'forest%'), for EUROPE-region
    suppliers (region instead of one nation so the result is
    non-degenerate at tiny SF). The threshold is exact bigint
    cross-multiplication (q96 * 10 > qall * 3): l_quantity is
    integral, so no float boundary.

    Scale: the quantity rollup shuffles on (partkey, suppkey) with
    map-side partial sums; part is name-filtered before its join;
    the candidate supplier set reduces to distinct suppkeys before
    the final semi-join against the region-filtered supplier dim.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("hot%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    in96 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.when(in96, F.col("l_quantity").cast("long")).otherwise(F.lit(0))
        ).alias("q96"),
        F.sum(F.col("l_quantity").cast("long")).alias("qall"),
    )
    cand = (
        qty.join(p, qty.l_partkey == p.p_partkey, "left_semi")
        .where(F.col("q96") * 10 > F.col("qall") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(cand, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
