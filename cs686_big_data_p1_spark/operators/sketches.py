"""Mergeable sketch summaries, represented relationally — the
HyperLogLog and Count-Min siblings of llm.bloom_prefilter's Bloom
filter: each sketch is a TINY aggregate (256 registers / 2048
counters) built with one map-side-combinable groupBy, broadcastable
to every executor regardless of input size, and — because every
register update is seeded-md5 integer arithmetic — bit-identical in
DuckDB, so the *approximation itself* is oracle-exact (the estimate
is compared hash-for-hash, not within a tolerance).

Why sketches are first-class at 100 TB: exact distinct counts and
exact per-key frequencies need O(keys) shuffled state; both sketches
here need O(1). The engine already maintains the streaming twin
in-state (stream_distinct_users holds Spark's HLL++ per open window;
stream_hot_keys holds per-key counters) — this module is the batch
anchor that pins the math those states rely on.

Cross-engine exactness rule (SURVEY.md §4.3): the only float ever
emitted is hll_estimate = ALPHA_M_M2_2P54 / sum_fp — a Python-
precomputed literal divided by an exactly-computed bigint, one
correctly-rounded IEEE-754 operation; no ln/exp/pow anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query, track_cache
from ..tables import load_table

# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007), relational
# ---------------------------------------------------------------------------

HLL_P = 8  # register-index bits
HLL_M = 1 << HLL_P  # 256 registers -> ~6.5% standard error
# max rho: h is 60 bits (15 md5 hex chars); w = h >> 8 has 52 bits, so
# rho = (leading zeros of w in 52 bits) + 1 is in [1, 53] and the
# fixed-point register term 2^(54 - rho) is always a positive bigint.
_HLL_FP_SHIFT = 54
# alpha_m * m^2 * 2^54, precomputed in Python and embedded as ONE
# literal in both dialects (both engines parse the same decimal text
# to the same IEEE double; the estimate is then a single division).
HLL_ALPHA_NUM = repr(
    0.7213 / (1.0 + 1.079 / float(HLL_M))
    * float(HLL_M) * float(HLL_M) * float(1 << _HLL_FP_SHIFT)
)

HLL_DISTINCT_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(printf('hll|%d', user_id)), 1, 15))
              AS BIGINT) AS h
  FROM events
),
reg AS (
  SELECT event_type, h & {HLL_M - 1} AS bucket,
         max(CASE WHEN (h >> {HLL_P}) = 0 THEN 53
                  ELSE 53 - length(bin(h >> {HLL_P})) END) AS m
  FROM h GROUP BY event_type, h & {HLL_M - 1}
),
s AS (
  SELECT event_type,
         CAST({HLL_M} - count(*) AS BIGINT) AS n_zero_registers,
         CAST(sum(CAST(1 AS BIGINT) << ({_HLL_FP_SHIFT} - m))
              + ({HLL_M} - count(*))
                * (CAST(1 AS BIGINT) << {_HLL_FP_SHIFT}) AS BIGINT) AS sum_fp
  FROM reg GROUP BY event_type
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT s.event_type, s.n_zero_registers, s.sum_fp,
       {HLL_ALPHA_NUM} / CAST(s.sum_fp AS DOUBLE) AS hll_estimate,
       ex.exact_distinct
FROM s JOIN ex ON ex.event_type = s.event_type
"""


@query("hll_distinct", oracle=HLL_DISTINCT_ORACLE)
def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via a relational HyperLogLog
    sketch ({HLL_M} registers), alongside the exact distinct count so
    the error is visible in the output. The register array is the
    groupBy result itself: bucket = low {HLL_P} hash bits, register =
    max(rho) where rho = leading-zero-count of the remaining 52 bits
    + 1 (computed portably as 53 - length(bin(w))). The harmonic-mean
    denominator is kept in EXACT fixed point — sum_fp =
    sum(2^(54-M_j)) over all m registers (empty register => 2^54) is
    a bigint < 2^62 — and the only float is the final single division
    by the alpha*m^2*2^54 literal, so the ESTIMATE is hash-exact
    cross-engine (no tolerance band). The small-range (linear
    counting) branch needs ln(), which is not cross-engine
    reproducible, so it deliberately lives in the CONSUMER: the query
    emits the exact sketch state (n_zero_registers is precisely what
    linear counting needs) and tests/test_sketches.py applies the full
    corrected estimator, pinned within 3 standard errors on both
    fixture SFs and on planted cardinalities in both regimes.

    Scale: the sketch state is m registers per group — the groupBy
    (event_type, bucket) has at most groups x {HLL_M} result rows and
    full map-side combine (max is algebraic), so 100 TB of events
    reduce to KBs before the exchange; this is THE scalable distinct
    count. The exact-distinct leg (for the error column) is the
    expensive O(distinct) shuffle the sketch replaces — kept here
    deliberately as the measured contrast, the same pattern as
    minhash_estimate_error / ann_recall (self-measured accuracy).
    stream_distinct_users maintains the same sketch shape live
    (Spark's HLL++) with one sketch per open window as its state.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return hll_sketch_frame(ev, "event_type", "user_id")


def hll_sketch_frame(d: DataFrame, grp: str, key: str) -> DataFrame:
    """Core of hll_distinct over any (group, key) frame (the query
    wrapper binds events; the planted-cardinality pytest feeds both
    estimator regimes). Emits the exact sketch state (registers folded
    to n_zero / sum_fp) plus the raw estimate and exact distinct."""
    h = F.conv(
        F.substring(
            F.md5(F.format_string("hll|%d", F.col(key)).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    w = F.shiftright(F.col("h"), HLL_P)
    rho = F.when(w == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(w)))
    reg = (
        d.select(grp, h.alias("h"))
        .select(
            grp,
            (F.col("h").bitwiseAND(F.lit(HLL_M - 1))).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(grp, "bucket")
        .agg(F.max("rho").alias("m"))
    )
    s = reg.groupBy(grp).agg(
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("bigint").alias(
            "n_zero_registers"
        ),
        (
            # shiftleft by a COLUMN amount needs the SQL form (the
            # Python helper only takes an int literal)
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_FP_SHIFT} - m)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << _HLL_FP_SHIFT).cast("bigint")
        ).alias("sum_fp"),
    )
    ex = d.groupBy(grp).agg(
        F.count_distinct(key).alias("exact_distinct")
    )
    return (
        s.join(F.broadcast(ex), grp)
        .select(
            grp,
            "n_zero_registers",
            "sum_fp",
            (F.lit(float(HLL_ALPHA_NUM)) / F.col("sum_fp").cast("double")).alias(
                "hll_estimate"
            ),
            "exact_distinct",
        )
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (Cormode & Muthukrishnan 2005), relational
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 512  # counters per row
CMS_TOPN = 100  # report the top-N exact keys with their sketch estimates

_CMS_KS_SQL = ", ".join(f"({k})" for k in range(CMS_D))

CMS_TOPK_ORACLE = f"""
WITH ks AS (SELECT * FROM (VALUES {_CMS_KS_SQL}) g(k)),
pos AS (
  SELECT ks.k,
         CAST(('0x' || substr(md5(printf('cms%d|%d', ks.k, user_id)), 1, 8))
              AS BIGINT) % {CMS_W} AS pos
  FROM events CROSS JOIN ks
),
counters AS (SELECT k, pos, count(*) AS cnt FROM pos GROUP BY k, pos),
exact AS (SELECT user_id, count(*) AS exact_count FROM events GROUP BY user_id),
top AS (
  SELECT user_id, exact_count FROM exact
  ORDER BY exact_count DESC, user_id LIMIT {CMS_TOPN}
),
probe AS (
  SELECT t.user_id, t.exact_count, ks.k,
         CAST(('0x' || substr(md5(printf('cms%d|%d', ks.k, t.user_id)), 1, 8))
              AS BIGINT) % {CMS_W} AS pos
  FROM top t CROSS JOIN ks
)
SELECT p.user_id, p.exact_count, min(c.cnt) AS cms_est,
       min(c.cnt) - p.exact_count AS overcount
FROM probe p JOIN counters c ON c.k = p.k AND c.pos = p.pos
GROUP BY p.user_id, p.exact_count
"""


def _cms_pos(k: F.Column, key: F.Column) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.format_string("cms%d|%d", k, key).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_W
    )


@query("cms_topk", oracle=CMS_TOPK_ORACLE)
def cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over per-user event frequencies: build a
    {CMS_D}x{CMS_W} counter array (each event increments one counter
    per hash row), then read back the top-{CMS_TOPN} users' estimates
    as min over their {CMS_D} counters, next to the exact counts. The
    overcount column (est - exact) is the sketch's one-sided error:
    Count-Min NEVER underestimates (min of counters that each include
    the key's full count) — pinned structurally by the oracle hash
    and adversarially by the planted-collision pytest.

    Scale: the counter build is one groupBy over (k, pos) with at
    most {CMS_D}*{CMS_W} result rows and full map-side combine — 100 TB
    of events reduce to a {CMS_D * CMS_W}-row / ~KB sketch that
    broadcasts to the probe side regardless of key cardinality, while
    an exact per-key count shuffles O(keys). The exact leg here is
    the deliberate measured contrast (same pattern as hll_distinct);
    the top-N read-back is TakeOrdered (O(N) per partition, no global
    sort). stream_hot_keys is the live sibling maintaining per-key
    counters in-stream; Count-Min is what it degrades to when even
    the active-key set outgrows state.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    ks = F.explode(F.array(*[F.lit(k) for k in range(CMS_D)])).alias("k")
    counters = (
        ev.select("user_id", ks)
        .select("k", _cms_pos(F.col("k"), F.col("user_id")).alias("pos"))
        .groupBy("k", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    top = exact.orderBy(F.col("exact_count").desc(), "user_id").limit(CMS_TOPN)
    probe = top.select(
        "user_id",
        "exact_count",
        ks,
    ).select(
        "user_id",
        "exact_count",
        "k",
        _cms_pos(F.col("k"), F.col("user_id")).alias("pos"),
    )
    return (
        probe.join(F.broadcast(counters), ["k", "pos"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "user_id",
            "exact_count",
            "cms_est",
            (F.col("cms_est") - F.col("exact_count")).alias("overcount"),
        )
    )


# --- KMV (theta) sketch: set operations on distinct-count sketches ------

KMV_K = 64  # minimum values kept per sketch
KMV_SALTS = 8  # stage-1 shards per segment (cap_domains' two-stage idiom)
# (K-1) * 2^60 as an exact double literal (63 fits in the mantissa next
# to the power of two), precomputed in Python: the estimate is then a
# single IEEE division by theta (cast to double) per the module rule.
KMV_EST_NUM = repr(float((KMV_K - 1) << 60))
KMV_K_F = repr(float(KMV_K))

KMV_SET_OPS_ORACLE = f"""
WITH segs AS (
  SELECT DISTINCT 'purchase' AS seg, user_id,
         CAST(('0x' || substr(md5(printf('kmv|%d', user_id)), 1, 15))
              AS BIGINT) AS h
  FROM events WHERE event_type = 'purchase'
  UNION
  SELECT DISTINCT 'click', user_id,
         CAST(('0x' || substr(md5(printf('kmv|%d', user_id)), 1, 15))
              AS BIGINT)
  FROM events WHERE event_type = 'click'
),
sk AS (
  SELECT seg, h FROM (
    SELECT seg, h, row_number() OVER (PARTITION BY seg ORDER BY h) AS r
    FROM segs
  ) WHERE r <= {KMV_K}
),
un AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS r
    FROM (SELECT DISTINCT h FROM sk)
  ) WHERE r <= {KMV_K}
),
theta AS (SELECT max(h) AS theta, CAST(count(*) AS BIGINT) AS n_sample FROM un),
common AS (
  SELECT CAST(count(*) AS BIGINT) AS n_common FROM (
    SELECT u.h FROM un u
    JOIN (SELECT DISTINCT h FROM segs WHERE seg = 'purchase') a ON a.h = u.h
    JOIN (SELECT DISTINCT h FROM segs WHERE seg = 'click') b ON b.h = u.h
  )
),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_union,
         CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT)
             AS exact_intersection
  FROM (
    SELECT user_id, count(DISTINCT event_type) = 2 AS in_both
    FROM events WHERE event_type IN ('purchase', 'click')
    GROUP BY user_id
  )
)
SELECT {KMV_K} AS k, t.n_sample, t.theta, c.n_common,
       CASE WHEN t.n_sample < {KMV_K} THEN CAST(t.n_sample AS DOUBLE)
            ELSE {KMV_EST_NUM} / CAST(t.theta AS DOUBLE) END AS est_union,
       ex.exact_union,
       CASE WHEN t.n_sample < {KMV_K} THEN CAST(c.n_common AS DOUBLE)
            ELSE (CAST(c.n_common AS DOUBLE) * {KMV_EST_NUM})
                 / (CAST(t.theta AS DOUBLE) * {KMV_K_F}) END
           AS est_intersection,
       ex.exact_intersection
FROM theta t, common c, ex
"""


@query("kmv_set_ops", oracle=KMV_SET_OPS_ORACLE)
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch set algebra: estimate |A ∪ B| and |A ∩ B| for
    two user segments (purchasers vs clickers) from two {KMV_K}-minimum-
    values sketches — the set OPERATIONS HyperLogLog cannot do
    (HLL unions but never intersects). Union sketch = bottom-{KMV_K}
    of the merged samples; theta = its K-th minimum; est_union =
    (K-1)*2^60/theta; est_intersection = (n_common/K) * est_union
    where n_common counts union-sample members present in BOTH input
    sets (Dasgupta et al., theta sketches). Both estimates are a
    Python-precomputed exact literal with one or two deterministic
    IEEE operations — hash-exact vs DuckDB, like hll_distinct. Exact
    union/intersection counts ride along as the measured contrast.

    Scale: each segment's sketch is built with cap_domains' two-stage
    bottom-k (stage 1 ranks within (seg, salt) hash shards and keeps
    {KMV_K} per shard; stage 2 ranks the <= {KMV_K}x{KMV_SALTS}
    survivors per segment) so no reducer ever sorts a whole segment;
    every downstream op touches only O(K) sketch rows. The exact legs
    are the O(distinct) shuffles the sketch replaces. Completes the
    relational sketch family: Bloom = membership (bloom_prefilter),
    HLL = cardinality (hll_distinct), Count-Min = frequency
    (cms_topk), MinHash = similarity (dedup_near), KMV = set algebra.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    pairs = ev.where(F.col("event_type").isin("purchase", "click")).select(
        F.col("event_type").alias("seg"), "user_id"
    )
    return kmv_set_ops_frame(pairs, "purchase", "click")


def kmv_set_ops_frame(pairs: DataFrame, seg_a: str, seg_b: str) -> DataFrame:
    """Core of kmv_set_ops over any (seg, user_id) membership frame
    (the query wrapper binds the two event_type segments; the planted
    partial-overlap pytest feeds known set sizes and cross-checks theta
    against a pure-Python bottom-k of the same md5 hashes)."""
    h = F.conv(
        F.substring(
            F.md5(F.format_string("kmv|%d", F.col("user_id")).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    segs = track_cache(
        pairs.distinct().select("seg", "user_id", h.alias("h"))
    )
    w1 = Window.partitionBy("seg", "_salt").orderBy("h")
    w2 = Window.partitionBy("seg").orderBy("h")
    sk = (
        segs.withColumn("_salt", F.pmod(F.xxhash64("user_id"), F.lit(KMV_SALTS)))
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= KMV_K)
        .withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= KMV_K)
        .select("seg", "h")
    )
    un = (
        sk.select("h")
        .distinct()
        .withColumn(
            "_r",
            F.row_number().over(Window.orderBy("h")),
        )
        .where(F.col("_r") <= KMV_K)
        .select("h")
    )
    un = track_cache(un)
    theta = un.agg(
        F.max("h").alias("theta"),
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
    )
    a_h = segs.where(F.col("seg") == seg_a).select("h").distinct()
    b_h = segs.where(F.col("seg") == seg_b).select("h").distinct()
    common = (
        un.join(a_h, "h", "left_semi")
        .join(b_h, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    per_user = segs.groupBy("user_id").agg(
        (F.count_distinct("seg") == 2).alias("both")
    )
    ex = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum(F.when(F.col("both"), 1).otherwise(0))
        .cast("bigint")
        .alias("exact_intersection"),
    )
    num = F.lit(float(KMV_EST_NUM))
    kf = F.lit(float(KMV_K_F))
    return (
        theta.crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(ex))
        .select(
            F.lit(KMV_K).alias("k"),
            "n_sample",
            "theta",
            "n_common",
            F.when(
                F.col("n_sample") < KMV_K, F.col("n_sample").cast("double")
            )
            .otherwise(num / F.col("theta").cast("double"))
            .alias("est_union"),
            "exact_union",
            F.when(
                F.col("n_sample") < KMV_K, F.col("n_common").cast("double")
            )
            .otherwise(
                (F.col("n_common").cast("double") * num)
                / (F.col("theta").cast("double") * kf)
            )
            .alias("est_intersection"),
            "exact_intersection",
        )
    )


# --- KLL-style mergeable quantile sketch ------------------------------------
#
# Completes the sketch family's missing axis (VERDICT r9 #9): Bloom =
# membership, HLL = cardinality, CMS = frequency, KMV = set algebra,
# THIS = quantiles. The sketch is the mergeable uniform-sampler core of
# KLL (Karnin, Lang & Liberty 2016): keep, per group, the KLL_K rows
# with the smallest md5('kll|'||event_id) — a bottom-k-by-hash set,
# which is (a) a uniform random sample of the group, (b) fully
# mergeable and order-independent (merge = union then bottom-k, exactly
# KMV's algebra applied to carry (value) payloads), and (c) entirely
# relational, so unlike percentile_approx's GK internals
# (approx_quantiles, rows-only) it is HASH-EXACT against a DuckDB
# replay. The trade vs full multi-level KLL compaction is rank error
# O(1/sqrt(k)) instead of O(1/k) — the price of an order-independent
# trajectory both engines can compute identically.

KLL_K = 256  # sample rows kept per group: ~3/sqrt(k) = 0.19 rank error @3s
KLL_SALTS = 8  # stage-1 shards (cap_domains' two-stage bottom-k idiom)

KLL_QUANTILES_ORACLE = f"""
WITH ev AS (
  SELECT event_type AS g, event_id, value,
         CAST(('0x' || substr(md5(printf('kll|%d', event_id)), 1, 15))
              AS BIGINT) AS h
  FROM events
),
sk AS (
  SELECT g, event_id, value FROM (
    SELECT g, event_id, value,
           row_number() OVER (PARTITION BY g ORDER BY h) AS r
    FROM ev
  ) WHERE r <= {KLL_K}
),
m AS (SELECT g, CAST(count(*) AS BIGINT) AS n_sample FROM sk GROUP BY g),
sr AS (
  SELECT g, value,
         row_number() OVER (PARTITION BY g ORDER BY value, event_id) AS r
  FROM sk
),
est AS (
  SELECT s.g,
         max(CASE WHEN s.r = (mm.n_sample + 1) // 2 THEN s.value END)
             AS p50_est,
         max(CASE WHEN s.r = (9 * mm.n_sample + 9) // 10 THEN s.value END)
             AS p90_est
  FROM sr s JOIN m mm ON mm.g = s.g
  GROUP BY s.g
),
fr AS (
  SELECT g, value,
         row_number() OVER (PARTITION BY g ORDER BY value, event_id) AS r,
         count(*) OVER (PARTITION BY g) AS n
  FROM ev
),
exact AS (
  SELECT g, CAST(max(n) AS BIGINT) AS n,
         max(CASE WHEN r = (n + 1) // 2 THEN value END) AS p50_exact,
         max(CASE WHEN r = (9 * n + 9) // 10 THEN value END) AS p90_exact
  FROM fr GROUP BY g
)
SELECT e.g AS event_type, {KLL_K} AS k, mm.n_sample, x.n,
       e.p50_est, x.p50_exact, e.p90_est, x.p90_exact
FROM est e
JOIN m mm ON mm.g = e.g
JOIN exact x ON x.g = e.g
"""


@query("kll_quantiles", oracle=KLL_QUANTILES_ORACLE)
def kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch per event_type: nearest-rank p50/p90
    estimated from the group's bottom-{KLL_K}-by-hash uniform sample
    (the KLL sampler layer — see module comment), with the exact
    nearest-rank answers riding along as the measured contrast (the
    kmv_set_ops pattern). The quantile extraction is pure integer rank
    arithmetic — rank = ceil(q*m) via (q_num*m + q_num) // q_den — and
    the sample membership is a deterministic hash order, so estimates
    AND exact legs hash-match DuckDB bit for bit.

    Scale: the sketch is built with the two-stage bottom-k (stage 1
    ranks within (group, salt) shards keeping {KLL_K} each; stage 2
    ranks the <= {KLL_K}x{KLL_SALTS} survivors), so no reducer ever
    sorts a whole group and per-group state is O(k) — the property
    that lets a 1000-executor job maintain quantiles for millions of
    groups in one shuffle of sample rows. The exact leg is the
    O(n log n)-per-group sort the sketch exists to replace; it stays
    here as the small-SF error contrast, same as kmv's exact union.
    tests/test_sketches.py pins the 3-sigma rank-error band on a
    planted distribution and merge-order invariance."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), "event_id", "value"
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.format_string("kll|%d", F.col("event_id")).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return kll_quantiles_frame(ev.select("g", "event_id", "value", h.alias("h")))


def kll_quantiles_frame(ev: DataFrame) -> DataFrame:
    """Core of kll_quantiles over any (g, event_id, value, h) frame
    (the query wrapper binds the events fixture and the md5 hash; the
    error-band pytest feeds a planted distribution)."""
    ev = track_cache(ev)
    w1 = Window.partitionBy("g", "_salt").orderBy("h")
    w2 = Window.partitionBy("g").orderBy("h")
    sk = (
        ev.withColumn(
            "_salt", F.pmod(F.xxhash64("event_id"), F.lit(KLL_SALTS))
        )
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= KLL_K)
        .withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= KLL_K)
        .select("g", "event_id", "value")
    )
    m = sk.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample")
    )
    w_val = Window.partitionBy("g").orderBy("value", "event_id")
    sr = sk.withColumn("r", F.row_number().over(w_val))
    est = (
        sr.join(m, "g")
        .groupBy("g")
        .agg(
            F.max(
                F.when(
                    F.col("r")
                    == F.expr("(n_sample + 1) div 2"),
                    F.col("value"),
                )
            ).alias("p50_est"),
            F.max(
                F.when(
                    F.col("r")
                    == F.expr("(9 * n_sample + 9) div 10"),
                    F.col("value"),
                )
            ).alias("p90_est"),
        )
    )
    fr = ev.select(
        "g",
        "value",
        F.row_number().over(w_val).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
    )
    exact = fr.groupBy("g").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.when(F.col("r") == F.expr("(n + 1) div 2"), F.col("value"))
        ).alias("p50_exact"),
        F.max(
            F.when(F.col("r") == F.expr("(9 * n + 9) div 10"), F.col("value"))
        ).alias("p90_exact"),
    )
    return (
        est.join(m, "g")
        .join(exact, "g")
        .select(
            F.col("g").alias("event_type"),
            F.lit(KLL_K).alias("k"),
            "n_sample",
            "n",
            "p50_est",
            "p50_exact",
            "p90_est",
            "p90_exact",
        )
    )
