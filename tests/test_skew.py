"""AQE skew-join validation: README/SURVEY claim AQE as the runtime
safety net for skewed join keys (hot filenames, boilerplate dedup
buckets). This test proves the claim on this Spark build — a join with
one pathological hot key must show skew-split AQEShuffleRead nodes in
the executed plan rather than one straggler partition."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    # thresholds scaled down so the fixture-sized hot key trips the
    # same code path a hot filename would at cluster scale; broadcast
    # off so the join actually shuffles
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n = 200_000
        # incompressible payload: shuffle sizes are compressed bytes,
        # so a constant pad would dedupe the hot partition under the
        # skew threshold and mask the effect
        pad = F.md5(F.col("id").cast("string"))
        # left: 95% of rows share key 0; right: uniform keys
        left = spark.range(n).select(
            F.when(F.col("id") % 20 != 0, 0)
            .otherwise(F.col("id") % 997)
            .alias("k"),
            pad.alias("pl"),
        )
        right = spark.range(997).select(
            F.col("id").alias("k"), pad.alias("pr")
        )
        joined = left.join(right, "k").select("k", "pl")
        # execute THIS dataframe's own query execution: AQE finalizes
        # the plan per-execution, so count()/write would inspect a
        # different (re-planned) execution than the one asserted on
        rows = joined.collect()
        assert len(rows) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan and "skewed" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


# ---------------------------------------------------------------------------
# Two-phase global rank: tie-skew sub-bucketing + NULL semantics
# (VERDICT r7 next-round #2, ADVICE r7 medium)
# ---------------------------------------------------------------------------


def _builtin_rank(df, value_col, tie_col, desc=False):
    from pyspark.sql.window import Window

    v = F.desc(value_col) if desc else F.asc(value_col)
    w = Window.orderBy(v, F.asc(tie_col))
    return df.withColumn("_want", F.row_number().over(w).cast("bigint"))


def _rank_pairs(df, value_col, tie_col, desc):
    from cs686_big_data_p1_spark.operators.analytics import (
        _two_phase_global_rank,
    )

    got = {
        r[tie_col]: r["_rank"]
        for r in _two_phase_global_rank(
            df, value_col, tie_col, desc=desc
        ).collect()
    }
    want = {
        r[tie_col]: r["_want"]
        for r in _builtin_rank(df, value_col, tie_col, desc=desc).collect()
    }
    return got, want


def test_two_phase_rank_splits_dominant_tied_value(spark, monkeypatch):
    """One value holds 90% of rows (the customer_rfm frequency shape,
    exaggerated): the composite (_bkt, _sub) buckets must stay near the
    proportional target — no bucket may hold more than a few n/B rows —
    and the ranks must still be exactly the built-in's. The absolute
    hot floor is zeroed so the proportional machinery engages at
    fixture scale (production keeps the floor; see
    test_two_phase_rank_hot_floor_skips_small_cells)."""
    import cs686_big_data_p1_spark.operators.analytics as A
    from cs686_big_data_p1_spark.operators.analytics import (
        RANK_BUCKETS,
        _rank_bucketed,
    )

    monkeypatch.setattr(A, "_MIN_SPLIT_ROWS", 0)

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("tie"),
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise((F.col("id") % 40).cast("long"))
        .alias("v"),
    )
    sizes = [
        r["c"]
        for r in _rank_bucketed(df, "v", "tie")
        .groupBy("_bkt", "_sub")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    # proportional allocation: a single-value bucket with c rows gets
    # ~c*B/n subs, so each composite bucket holds ~n/B rows; allow 4x
    # slack for rounding
    cap = 4 * (n // RANK_BUCKETS + 1)
    assert max(sizes) <= cap, f"hot composite bucket: {max(sizes)} > {cap}"
    assert sum(sizes) == n
    for desc in (False, True):
        got, want = _rank_pairs(df, "v", "tie", desc)
        assert got == want, f"desc={desc}"


def test_two_phase_rank_all_tied_single_value(spark, monkeypatch):
    """Degenerate extrema (_hi == _lo): one value bucket, which must
    sub-split on the tie range instead of collapsing to the old
    single-task plan."""
    import cs686_big_data_p1_spark.operators.analytics as A
    from cs686_big_data_p1_spark.operators.analytics import _rank_bucketed

    monkeypatch.setattr(A, "_MIN_SPLIT_ROWS", 0)

    n = 8_192
    df = spark.range(n).select(
        F.col("id").alias("tie"), F.lit(42).alias("v")
    )
    bucketed = _rank_bucketed(df, "v", "tie")
    n_sub = bucketed.select("_bkt", "_sub").distinct().count()
    assert n_sub > 1, "all-tied input was not sub-split"
    got, want = _rank_pairs(df, "v", "tie", False)
    assert got == want


def test_two_phase_rank_keeps_and_orders_nulls(spark):
    """ADVICE r7 medium: NULL values must not be dropped (the old inner
    join on a NULL bucket discarded them) and must rank exactly where
    Window.orderBy puts them — NULLS FIRST asc, NULLS LAST desc."""
    df = spark.range(1_000).select(
        F.col("id").alias("tie"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 13)
        .cast("long")
        .alias("v"),
    )
    for desc in (False, True):
        got, want = _rank_pairs(df, "v", "tie", desc)
        assert len(got) == 1_000, "NULL-valued rows were dropped"
        assert got == want, f"desc={desc}"


def test_two_phase_rank_non_numeric_tie_still_exact(spark):
    """String tie column: sub-splitting disengages (no exact numeric
    cast) but ranks must still match the built-in, including on a
    heavily tied value column."""
    df = spark.range(2_000).select(
        F.format_string("k%05d", F.col("id")).alias("tie"),
        (F.col("id") % 3).alias("v"),
    )
    got, want = _rank_pairs(df, "v", "tie", False)
    assert got == want


def test_two_phase_rank_splits_multivalue_hot_bucket(spark, monkeypatch):
    """Wide value range (forces bucket width > 1) with 90% of the mass
    on a narrow band of ADJACENT values: the hot bucket holds many
    distinct values, so the tie split can't apply — it must sub-split
    on VALUE ranges instead, and ranks stay exact."""
    import cs686_big_data_p1_spark.operators.analytics as A
    from cs686_big_data_p1_spark.operators.analytics import (
        RANK_BUCKETS,
        _rank_bucketed,
    )

    monkeypatch.setattr(A, "_MIN_SPLIT_ROWS", 0)

    n = 20_000
    # values: 90% in [0, 400) (well inside one width-~2500 bucket of
    # the [0, 10^7] range), 10% spread over the full range
    df = spark.range(n).select(
        F.col("id").alias("tie"),
        F.when(F.col("id") % 10 != 0, F.col("id") % 400)
        .otherwise((F.col("id") * 499) % 10_000_000)
        .alias("v"),
    )
    sizes = [
        r["c"]
        for r in _rank_bucketed(df, "v", "tie")
        .groupBy("_bkt", "_sub")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    cap = 4 * (n // RANK_BUCKETS + 1)
    # the dominant band spans 400 distinct values: a value-range split
    # cannot go below per-value granularity (400/subs >= 1 value per
    # sub, each ~45 rows here), but the old whole-bucket pileup
    # (18k rows in one task) must be gone
    assert max(sizes) <= max(cap, 2 * (18_000 // 400 + 1)), max(sizes)
    assert sum(sizes) == n
    for desc in (False, True):
        got, want = _rank_pairs(df, "v", "tie", desc)
        assert got == want, f"desc={desc}"


def test_two_phase_rank_fixpoint_splits_nested_skew(spark, monkeypatch):
    """r8 verdict #2 pathology: ONE dominant tied value (90% of rows,
    tie range >> RANK_BUCKETS) hiding inside a WIDE multi-value bucket.
    One split level isolates the value (value-range split) but leaves
    all its rows in one cell; the fixpoint must then tie-split that
    cell — no composite bucket may hold more than ~2n/B rows — and the
    ranks must still be exactly the built-in's."""
    import cs686_big_data_p1_spark.operators.analytics as A
    from cs686_big_data_p1_spark.operators.analytics import (
        RANK_BUCKETS,
        _rank_bucketed,
    )

    monkeypatch.setattr(A, "_MIN_SPLIT_ROWS", 0)

    n = 40_000  # tie range = n ~ 10x RANK_BUCKETS
    df = spark.range(n).select(
        F.col("id").alias("tie"),
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise((F.col("id") * 499) % 10_000_000)
        .alias("v"),
    )
    sizes = [
        r["c"]
        for r in _rank_bucketed(df, "v", "tie")
        .groupBy("_bkt", "_sub")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    cap = 4 * (n // RANK_BUCKETS + 1)
    assert max(sizes) <= cap, f"hot composite bucket: {max(sizes)} > {cap}"
    assert sum(sizes) == n
    for desc in (False, True):
        got, want = _rank_pairs(df, "v", "tie", desc)
        assert got == want, f"desc={desc}"


def test_two_phase_rank_full_tie_group_terminates(spark):
    """A pure full-tie group (identical value AND tie for 90% of rows)
    is unsplittable by any deterministic monotone key: the fixpoint
    must TERMINATE (not spin to the level cap) and still rank exactly;
    the full-tie cell legitimately stays hot."""
    from cs686_big_data_p1_spark.operators.analytics import _rank_bucketed

    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 10 != 0, F.lit(5)).otherwise(
            F.col("id") % 100
        ).alias("tie"),
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(
            F.col("id") % 40
        ).alias("v"),
    )
    bucketed = _rank_bucketed(df, "v", "tie")
    assert bucketed.count() == n  # no rows lost, loop terminated
    # rank exactness on the deduplicated total order: full-tie rows
    # share (v, tie) so compare RANK SETS per (v, tie) group instead
    from cs686_big_data_p1_spark.operators.analytics import (
        _two_phase_global_rank,
    )

    got = _two_phase_global_rank(df, "v", "tie").collect()
    want = _builtin_rank(df, "v", "tie").collect()
    by_key_got: dict = {}
    by_key_want: dict = {}
    for r in got:
        by_key_got.setdefault((r.v, r.tie), set()).add(r._rank)
    for r in want:
        by_key_want.setdefault((r.v, r.tie), set()).add(r._want)
    assert by_key_got == by_key_want


def test_two_phase_rank_hot_floor_skips_small_cells(spark):
    """Production behavior of the absolute hot floor: a tied cell
    BELOW _MIN_SPLIT_ROWS must not sub-split (one task handles it
    trivially; splitting would only add driver round-trips — the r9
    bench regression), while ranks stay exactly the built-in's."""
    from cs686_big_data_p1_spark.operators.analytics import (
        _MIN_SPLIT_ROWS,
        _rank_bucketed,
    )

    n = 8_000  # dominant cell 3000 rows < _MIN_SPLIT_ROWS = 4096
    assert n // 2 < _MIN_SPLIT_ROWS
    df = spark.range(n).select(
        F.col("id").alias("tie"),
        F.when(F.col("id") % 8 < 3, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("v"),
    )
    b = _rank_bucketed(df, "v", "tie")
    subs = {r["_sub"] for r in b.select("_sub").distinct().collect()}
    assert subs == {0}, "sub-split engaged below the hot floor"
    got, want = _rank_pairs(df, "v", "tie", False)
    assert got == want
