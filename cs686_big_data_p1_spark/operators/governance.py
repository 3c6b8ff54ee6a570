"""Data-governance operators: privacy risk measurement before a
dataset leaves the pipeline.

k_anonymity implements full-domain generalization (Samarati/Sweeney):
walk a fixed generalization ladder over the quasi-identifiers
(account-balance band widths doubling, then dropping attributes) and
pick the LOWEST level at which every equivalence class holds at least
K_ANON records — the minimal blur that defeats re-identification by
QI join. The whole lattice is evaluated in ONE aggregation pass via
GROUPING SETS (Spark compiles it to a single Expand + groupBy — one
shuffle regardless of how many levels the ladder has), which is the
100 TB-correct shape: a per-level loop would rescan the table once
per rung.

Everything is integer/string arithmetic; balance banding uses the
exact-cents fixed-point idiom (floor(x*100) is the same double op in
both engines) plus a band-width-multiple offset so integer division
never sees a negative operand (Spark `div` truncates toward zero
while DuckDB `//` floors — identical only for non-negatives, so the
offset is correctness, not cosmetics). Suppressed attributes surface
as NULL key columns out of the grouping sets; the fixture QIs are
never NULL themselves, so level detection is pure IS NULL logic,
identical in both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, track_cache
from ..tables import load_table

K_ANON = 5  # minimum equivalence-class size
_BAND0 = 100_000  # level-0 band: 1000 currency units, in cents
# offset = multiple of every band width (they double), so banding is
# shift-invariant and the divided operand is always non-negative
_OFF = _BAND0 * 1024

_LEVELS = 7  # b0 b1 b2 b3 | drop balance | drop nation | drop segment


def _bands_sql(div: str) -> str:
    return ", ".join(
        f"(CAST(floor(c_acctbal * 100.0) AS BIGINT) + {_OFF}) "
        f"{div} {_BAND0 * (1 << i)} AS b{i}"
        for i in range(4)
    )


K_ANONYMITY_ORACLE = f"""
WITH base AS (
  SELECT c_custkey, c_nationkey, c_mktsegment, {_bands_sql('//')}
  FROM customer
),
lattice AS (
  SELECT CASE WHEN b0 IS NOT NULL THEN 0
              WHEN b1 IS NOT NULL THEN 1
              WHEN b2 IS NOT NULL THEN 2
              WHEN b3 IS NOT NULL THEN 3
              WHEN c_nationkey IS NOT NULL THEN 4
              WHEN c_mktsegment IS NOT NULL THEN 5
              ELSE 6 END AS level,
         coalesce(CAST(c_nationkey AS VARCHAR), '*') AS nation_g,
         coalesce(c_mktsegment, '*') AS segment_g,
         coalesce(CAST(b0 AS VARCHAR), CAST(b1 AS VARCHAR),
                  CAST(b2 AS VARCHAR), CAST(b3 AS VARCHAR), '*') AS band_g,
         CAST(count(*) AS BIGINT) AS n
  FROM base
  GROUP BY GROUPING SETS (
    (c_nationkey, c_mktsegment, b0),
    (c_nationkey, c_mktsegment, b1),
    (c_nationkey, c_mktsegment, b2),
    (c_nationkey, c_mktsegment, b3),
    (c_nationkey, c_mktsegment),
    (c_mktsegment),
    ()
  )
),
chosen AS (
  SELECT min(level) AS lvl FROM (
    SELECT level, min(n) AS min_n FROM lattice GROUP BY level
  ) WHERE min_n >= {K_ANON}
)
SELECT l.level, l.nation_g, l.segment_g, l.band_g, l.n
FROM lattice l, chosen c
WHERE l.level = c.lvl
"""


@query("k_anonymity", oracle=K_ANONYMITY_ORACLE)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal full-domain generalization achieving {K_ANON}-anonymity
    over the customer quasi-identifiers (nation, market segment,
    account-balance band): emit every equivalence class at the LOWEST
    ladder level where no class has fewer than {K_ANON} members. The
    ladder doubles the balance band width (levels 0-3), then drops
    balance (4), nation (5), segment (6 — one class, the guaranteed
    terminator). All {_LEVELS} rungs are computed in one GROUPING SETS
    aggregation (a single Expand + shuffle), the per-level minimum is
    a {_LEVELS}-row aggregate, and the chosen level's classes are
    re-emitted from the same cached lattice — so at 100 TB this costs
    one pass over the table, not one per rung, and the lattice itself
    is at most the sum of the per-rung class counts (bounded by the QI
    domains, not by rows).

    Output is deterministic and hash-exact: class keys are generalized
    to strings ('*' = suppressed attribute), counts are exact bigints,
    and the only float op (cents = floor(acctbal*100)) is the
    identical IEEE double operation in both engines.
    """
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        *[
            F.expr(
                f"(CAST(floor(c_acctbal * 100.0) AS BIGINT) + {_OFF}) "
                f"div {_BAND0 * (1 << i)}"
            ).alias(f"b{i}")
            for i in range(4)
        ],
    )
    sets = [
        ["c_nationkey", "c_mktsegment", "b0"],
        ["c_nationkey", "c_mktsegment", "b1"],
        ["c_nationkey", "c_mktsegment", "b2"],
        ["c_nationkey", "c_mktsegment", "b3"],
        ["c_nationkey", "c_mktsegment"],
        ["c_mktsegment"],
        [],
    ]
    level = (
        F.when(F.col("b0").isNotNull(), 0)
        .when(F.col("b1").isNotNull(), 1)
        .when(F.col("b2").isNotNull(), 2)
        .when(F.col("b3").isNotNull(), 3)
        .when(F.col("c_nationkey").isNotNull(), 4)
        .when(F.col("c_mktsegment").isNotNull(), 5)
        .otherwise(6)
    )
    lattice = track_cache(
        base.groupingSets(
            sets, "c_nationkey", "c_mktsegment", "b0", "b1", "b2", "b3"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            level.alias("level"),
            F.coalesce(F.col("c_nationkey").cast("string"), F.lit("*")).alias(
                "nation_g"
            ),
            F.coalesce(F.col("c_mktsegment"), F.lit("*")).alias("segment_g"),
            F.coalesce(
                F.col("b0").cast("string"),
                F.col("b1").cast("string"),
                F.col("b2").cast("string"),
                F.col("b3").cast("string"),
                F.lit("*"),
            ).alias("band_g"),
            "n",
        )
    )
    chosen = (
        lattice.groupBy("level")
        .agg(F.min("n").alias("min_n"))
        .where(F.col("min_n") >= K_ANON)
        .agg(F.min("level").alias("lvl"))
    )
    return lattice.join(
        F.broadcast(chosen), lattice["level"] == F.col("lvl")
    ).select("level", "nation_g", "segment_g", "band_g", "n")


# --- l-diversity over the anonymized classes ------------------------------

L_DIV = 3  # required distinct sensitive values per equivalence class
_LDIV_BAND = _BAND0 * 2  # level-1 band width (2000 currency units)

L_DIVERSITY_ORACLE = f"""
SELECT c_mktsegment AS segment_g,
       CAST((CAST(floor(c_acctbal * 100.0) AS BIGINT) + {_OFF})
            // {_LDIV_BAND} AS VARCHAR) AS band_g,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS l_distinct,
       count(DISTINCT c_nationkey) >= {L_DIV} AS l_ok
FROM customer
GROUP BY 1, 2
"""


@query("l_diversity", oracle=L_DIVERSITY_ORACLE)
def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al.), the second
    privacy gate after k_anonymity: a class can be k-anonymous yet
    leak its sensitive attribute if every member SHARES it — so for
    each (market segment, balance band) equivalence class, report the
    number of distinct sensitive values (nation) and whether it meets
    l = {L_DIV}. k-anonymity bounds re-identification; l-diversity
    bounds attribute disclosure — pipelines need both before release.

    Scale: one groupBy with two algebraic aggregates (count +
    count_distinct over a 25-value domain — Spark expands it to an
    exact two-phase aggregate, no O(rows) state); result cardinality
    is the QI domain product, not the row count. Entropy l-diversity
    is deliberately absent: it needs ln(), which is not cross-engine
    bit-reproducible (the hll_distinct rationale); the distinct
    variant is exact integers end to end.
    """
    c = load_table(spark, sf_dir, "customer")
    band = F.expr(
        f"CAST((CAST(floor(c_acctbal * 100.0) AS BIGINT) + {_OFF}) "
        f"div {_LDIV_BAND} AS STRING)"
    )
    return (
        c.select(
            F.col("c_mktsegment").alias("segment_g"),
            band.alias("band_g"),
            "c_nationkey",
        )
        .groupBy("segment_g", "band_g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct("c_nationkey").cast("bigint").alias("l_distinct"),
        )
        .select(
            "segment_g",
            "band_g",
            "n",
            "l_distinct",
            (F.col("l_distinct") >= L_DIV).alias("l_ok"),
        )
    )


# --- t-closeness over the anonymized classes -------------------------------

# threshold t = T_NUM/T_DEN; a class passes iff its variational
# distance to the global sensitive distribution is <= t. The check is
# pure integers: d = sum|cnt_i*N - g_i*n| / (2nN) <= T_NUM/T_DEN
# <=> T_DEN * sum|...| <= 2nN * T_NUM.
T_NUM, T_DEN = 1, 5  # t = 0.2

# Guarded down-cast of the exact variational-distance numerator
# (ADVICE r10): the sum aggregates at Spark's native decimal(38,0);
# values past BIGINT max raise loudly BEFORE the cast to the (30,0)
# working precision (needed to keep the t_ok cross-multiply within
# DuckDB's p1+p2<=38 rule), so non-ANSI Spark can never render an
# overflow as silent NULLs in t_num/t_dist/t_ok. The IS NULL arm
# (ADVICE r11) closes the residual window ABOVE the guard: if the
# decimal(38,0) sum itself overflows 38 digits, non-ANSI Spark yields
# NULL, and a bare `NULL > bound` falls through to ELSE where
# CAST(NULL) is silent — the exact failure class the guard targets,
# one threshold higher (~1e38, plausible at 100 TB since the summand
# is already a 37-digit product). Module-level so
# tests/test_governance.py pins the raise on a planted 1e31 sum.
T_SUM_GUARD_SQL = (
    "CASE WHEN t_sum_raw IS NULL"
    " OR t_sum_raw > CAST(9223372036854775807 AS DECIMAL(38,0))"
    " THEN CAST(raise_error('t_closeness: t_num exceeds BIGINT')"
    " AS DECIMAL(30,0))"
    " ELSE CAST(t_sum_raw AS DECIMAL(30,0)) END"
)

T_CLOSENESS_ORACLE = f"""
WITH cls AS (
  SELECT c_mktsegment AS segment_g,
         (CAST(floor(c_acctbal * 100.0) AS BIGINT) + {_OFF})
             // {_LDIV_BAND} AS band_i,
         c_nationkey, count(*) AS cnt
  FROM customer GROUP BY 1, 2, 3
),
classes AS (
  SELECT segment_g, band_i, CAST(sum(cnt) AS BIGINT) AS n
  FROM cls GROUP BY 1, 2
),
gdist AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS g FROM customer GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM customer),
full_grid AS (
  SELECT c.segment_g, c.band_i, c.n, g.c_nationkey, g.g,
         coalesce(x.cnt, 0) AS cnt
  FROM classes c
  CROSS JOIN gdist g
  LEFT JOIN cls x ON x.segment_g = c.segment_g AND x.band_i = c.band_i
                 AND x.c_nationkey = g.c_nationkey
),
sums AS (
  SELECT f.segment_g, f.band_i, f.n,
         CAST(sum(abs(CAST(f.cnt AS DECIMAL(18,0))
                          * CAST(t.big_n AS DECIMAL(18,0))
                      - CAST(f.g AS DECIMAL(18,0))
                          * CAST(f.n AS DECIMAL(18,0))))
              AS DECIMAL(30,0)) AS t_sum,
         CAST(CAST(f.n AS DECIMAL(18,0)) * CAST(t.big_n AS DECIMAL(18,0))
              AS DECIMAL(30,0)) AS nb
  FROM full_grid f, tot t
  GROUP BY f.segment_g, f.band_i, f.n, t.big_n
)
SELECT segment_g, CAST(band_i AS VARCHAR) AS band_g, n,
       CASE WHEN t_sum > CAST(9223372036854775807 AS DECIMAL(30,0))
            THEN CAST(error('t_closeness: t_num exceeds BIGINT') AS BIGINT)
            ELSE CAST(t_sum AS BIGINT) END AS t_num,
       CAST(t_sum AS DOUBLE)
           / CAST(CAST(2 AS DECIMAL(2,0)) * nb AS DOUBLE) AS t_dist,
       CAST({T_DEN} AS DECIMAL(8,0)) * t_sum
           <= CAST({2 * T_NUM} AS DECIMAL(8,0)) * nb AS t_ok
FROM sums
"""


@query("t_closeness", oracle=T_CLOSENESS_ORACLE)
def t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007), the third privacy gate: a
    class can be k-anonymous AND l-diverse yet still leak — if its
    sensitive-value DISTRIBUTION diverges from the table's, observing
    the class shifts an attacker's posterior. For each (segment,
    balance-band) class, compute the variational distance between the
    class's nation distribution and the global one, d = (1/2)sum
    |p_i - q_i|, and flag classes with d > t = {T_NUM}/{T_DEN}. The
    distance numerator sum|cnt_i*N - g_i*n| is EXACT (missing nations
    enter as |0 - g_i*n| via the class x nation grid), t_dist is one
    IEEE division of two exact integers, and the pass flag is the
    cross-multiplied integer comparison — no float ever decides.

    Overflow envelope (ADVICE r9): at 100 TB scale big_n ~1e11+ makes
    cnt*big_n exceed int64, so every product and the numerator sum are
    computed in DECIMAL — exact to 1e30, i.e. n*N up to ~5e29, far past
    any real table — and the BIGINT t_num output column is guarded by
    an explicit raise_error/error() when the exact sum would not fit,
    so the claim can never degrade into a silent wrap.

    Scale: the per-(class, nation) rollup is one groupBy; the grid is
    classes x |nation domain| (25) — bounded by QI and sensitive
    domains, never by rows; the global distribution is a 25-row
    broadcast. Completes the release-gate trio: k_anonymity bounds
    re-identification, l_diversity bounds attribute disclosure,
    t_closeness bounds distributional skew.
    """
    c = load_table(spark, sf_dir, "customer")
    band = F.expr(
        f"(CAST(floor(c_acctbal * 100.0) AS BIGINT) + {_OFF}) "
        f"div {_LDIV_BAND}"
    )
    cls = track_cache(
        c.select(
            F.col("c_mktsegment").alias("segment_g"),
            band.alias("band_i"),
            "c_nationkey",
        )
        .groupBy("segment_g", "band_i", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    classes = cls.groupBy("segment_g", "band_i").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    glob = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("g")
    )
    tot = c.agg(F.count(F.lit(1)).cast("bigint").alias("big_n"))
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .join(cls, ["segment_g", "band_i", "c_nationkey"], "left")
        .select(
            "segment_g",
            "band_i",
            "n",
            "g",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
        .crossJoin(F.broadcast(tot))
    )
    dec = "decimal(18,0)"
    diff = F.abs(
        F.col("cnt").cast(dec) * F.col("big_n").cast(dec)
        - F.col("g").cast(dec) * F.col("n").cast(dec)
    )
    # ADVICE r10: aggregate at Spark's native sum-of-decimal precision
    # (decimal(38,0)) and guard BEFORE any down-cast. The previous
    # .cast("decimal(30,0)") inside the agg meant a sum past 1e30
    # silently became NULL under non-ANSI Spark, and the BIGINT guard
    # then saw NULL > bound = NULL -> ELSE -> NULL t_num/t_dist/t_ok.
    # Guarding the raw sum first (bigint max 9.2e18 << 1e30) makes the
    # (30,0) working precision — needed so the t_ok multiply stays
    # within DuckDB-compatible p1+p2<=38 — provably overflow-free.
    return (
        grid.groupBy("segment_g", "band_i", "n", "big_n")
        .agg(F.sum(diff).alias("t_sum_raw"))
        .withColumn("t_sum", F.expr(T_SUM_GUARD_SQL))
        .withColumn(
            "nb",
            (F.col("n").cast(dec) * F.col("big_n").cast(dec)).cast(
                "decimal(30,0)"
            ),
        )
        .select(
            "segment_g",
            F.col("band_i").cast("string").alias("band_g"),
            "n",
            F.col("t_sum").cast("bigint").alias("t_num"),
            (
                F.col("t_sum").cast("double")
                / (F.lit(2).cast("decimal(2,0)") * F.col("nb")).cast(
                    "double"
                )
            ).alias("t_dist"),
            (
                F.lit(T_DEN).cast("decimal(8,0)") * F.col("t_sum")
                <= F.lit(2 * T_NUM).cast("decimal(8,0)") * F.col("nb")
            ).alias("t_ok"),
        )
    )
