"""Property tests from SURVEY.md §5.3.

The reference's state-mutation invariants, checked relationally:
  * publishChunk is an idempotent upsert (controller/FileTable.java:107-122):
    applying the merge twice equals applying it once.
  * heartbeat delta identity (storageNode/HeartbeatRunnable.java:101-143):
    old snapshot ⊕ getDiff(old, new) = new snapshot.
  * node-offline cascade (controller/FileTable.java:59-97): after the
    cascade, no surviving chunk has zero online replicas, and lost_chunks
    is exactly the set with zero online replicas.

Structural properties run under hypothesis on generated replica tables
(small example counts — each example round-trips through Spark); the
cascade invariant runs on the real fixture views.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (filename, sequence_no, host, port) replica rows over a tiny key space so
# generated tables actually overlap
_replica_rows = st.lists(
    st.tuples(
        st.sampled_from(["fa.dat", "fb.dat", "fc.dat"]),
        st.integers(0, 3),
        st.sampled_from(["bass14", "bass15", "bass16"]),
        st.sampled_from([9014, 9015]),
    ),
    min_size=0,
    max_size=12,
)

_SCHEMA = "filename string, sequence_no int, host string, port int"
_KEY = ["filename", "sequence_no", "host", "port"]


def _multiset_equal(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


@_SETTINGS
@given(table=_replica_rows, incoming=_replica_rows)
def test_publish_upsert_idempotent(spark, table, incoming):
    t = spark.createDataFrame(table, _SCHEMA)
    inc = spark.createDataFrame(incoming, _SCHEMA)

    def upsert(base):
        return base.unionByName(inc).dropDuplicates(_KEY)

    once = upsert(t)
    twice = upsert(once)
    assert _multiset_equal(once.distinct(), twice.distinct())


@_SETTINGS
@given(old=_replica_rows, new=_replica_rows)
def test_inventory_delta_identity(spark, old, new):
    """old ⊕ delta = new for set-semantics snapshots (the reference's
    chunk maps are sets: Map<String, SortedSet<Chunk>>)."""
    o = spark.createDataFrame(old, _SCHEMA).distinct()
    n = spark.createDataFrame(new, _SCHEMA).distinct()
    delta = n.exceptAll(o)  # getDiff: what the next heartbeat reports
    rebuilt = o.join(n, _KEY, "left_semi").unionByName(delta)
    assert _multiset_equal(rebuilt.distinct(), n)


def test_inventory_delta_identity_fixture(spark, registry):
    from cs686_big_data_p1_spark.views import replicas_df

    r = replicas_df(spark, SF_SMALL)
    old = r.where((F.col("sequence_no") + F.col("port")) % 7 != 0)
    delta = registry.QUERIES["inventory_delta"](spark, SF_SMALL)
    assert _multiset_equal(old.unionByName(delta), r)


def test_publish_upsert_idempotent_fixture(spark, registry):
    once = registry.QUERIES["publish_upsert"](spark, SF_SMALL)
    from cs686_big_data_p1_spark.operators.dfs_meta import round_robin_assign

    twice = (
        once.unionByName(round_robin_assign(spark, SF_SMALL))
        .dropDuplicates(_KEY)
    )
    assert _multiset_equal(once, twice)


def test_cascade_no_zero_replica_survivors(spark, registry):
    """Every chunk either keeps >=1 online replica after the cascade or
    appears in lost_chunks — and never both."""
    from cs686_big_data_p1_spark.views import chunks_df

    chunk_key = ["filename", "sequence_no"]
    surviving = registry.QUERIES["surviving_replicas"](spark, SF_SMALL)
    lost = registry.QUERIES["lost_chunks"](spark, SF_SMALL)
    chunks = chunks_df(spark, SF_SMALL).select(*chunk_key)

    with_survivor = surviving.select(*chunk_key).distinct()
    no_survivor = chunks.join(with_survivor, chunk_key, "left_anti")
    assert _multiset_equal(no_survivor, lost.select(*chunk_key))
    assert lost.join(with_survivor, chunk_key, "left_semi").isEmpty()


def test_salted_manifest_rollup_matches_unsalted(spark):
    """SURVEY §4.3 skew hardening: on a pathological dataset where ONE
    file holds every chunk, the salted two-phase rollup must produce
    exactly the unsalted result (same per-file sorted chunk array)."""
    from cs686_big_data_p1_spark.operators.dfs_meta import manifest_rollup

    n = 5000
    rows = [("bigfile.dat", i, f"bass{14 + i % 10}:9014") for i in range(n)]
    rows += [("tiny.dat", 0, "bass15:9015")]
    per_chunk = spark.createDataFrame(
        rows, "filename string, sequence_no int, nodes string"
    ).repartition(32)

    unsalted = {
        r.filename: [tuple(c) for c in r.chunks]
        for r in manifest_rollup(per_chunk, n_salt=0).collect()
    }
    salted = {
        r.filename: [tuple(c) for c in r.chunks]
        for r in manifest_rollup(per_chunk, n_salt=16).collect()
    }
    assert salted == unsalted
    assert len(salted["bigfile.dat"]) == n
    assert salted["bigfile.dat"] == sorted(salted["bigfile.dat"])


def test_asof_bucketed_matches_unbounded(spark, registry):
    """VERDICT r3 #7: the (user, time-bucket) bounded-window as-of join
    must reproduce the unbounded per-user window's output exactly —
    on the events fixture AND on a pathological single-user stream
    whose matches must carry across many empty buckets."""
    import datetime

    from pyspark.sql import functions as F

    from cs686_big_data_p1_spark.operators.analytics import (
        asof_join_bucketed_frames,
    )

    def as_set(df):
        return {
            (r.purchase_id, r.user_id, r.purchase_ts,
             r.asof_view_id, r.asof_view_ts)
            for r in df.collect()
        }

    # 1. fixture parity: registered bucketed query vs registered asof_join
    got = as_set(registry.QUERIES["asof_join_bucketed"](spark, SF_SMALL))
    want = as_set(registry.QUERIES["asof_join"](spark, SF_SMALL))
    assert got == want and got

    # 2. single user, one view, purchases hours later (tiny 60 s
    # buckets): the carry must propagate across dozens of empty buckets
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    views = spark.createDataFrame(
        [(1, t0, 100)], "user_id long, t timestamp, event_id long"
    )
    purchases = spark.createDataFrame(
        [
            (1, t0 + datetime.timedelta(hours=h), 200 + h)
            for h in range(1, 6)
        ]
        + [(1, t0 - datetime.timedelta(hours=1), 199)],  # before any view
        "user_id long, t timestamp, purchase_id long",
    )
    rows = {
        r.purchase_id: (r.asof_view_id, r.asof_view_ts)
        for r in asof_join_bucketed_frames(
            views, purchases, bucket_s=60
        ).collect()
    }
    assert rows[199] == (None, None)
    for h in range(1, 6):
        assert rows[200 + h] == (100, t0)


def test_skyline_orders_frontier_invariants(spark):
    """Skyline output must (1) contain no dominated pair itself and
    (2) dominate or tie every excluded order of the same customer."""
    from collections import defaultdict

    from cs686_big_data_p1_spark.operators.analytics import skyline_orders
    from cs686_big_data_p1_spark.tables import load_table
    from tests.conftest import SF_SMALL

    sky = defaultdict(list)
    for r in skyline_orders(spark, SF_SMALL).collect():
        sky[r.o_custkey].append((r.o_totalprice, r.o_orderdate, r.o_orderkey))
    allo = defaultdict(list)
    for r in (
        load_table(spark, SF_SMALL, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    ):
        allo[r.o_custkey].append((r.o_totalprice, r.o_orderdate, r.o_orderkey))

    def dominates(a, b):
        return (
            a[0] <= b[0] and a[1] <= b[1] and (a[0] < b[0] or a[1] < b[1])
        )

    assert sky, "empty skyline"
    for cust, pts in sky.items():
        for b in pts:  # internal consistency: frontier is an antichain
            assert not any(dominates(a, b) for a in pts if a is not b)
        kept_keys = {p[2] for p in pts}
        for b in allo[cust]:  # every excluded order is dominated
            if b[2] not in kept_keys:
                assert any(dominates(a, b) for a in pts)


def test_aqp_estimate_covers_truth(spark):
    """The Horvitz-Thompson estimate must bracket the true per-priority
    revenue within 4 standard errors, and the error bar itself must be
    positive and finite for every sampled group."""
    import math

    from pyspark.sql import functions as F

    from cs686_big_data_p1_spark.operators.analytics import (
        aqp_revenue,
        s6,
        unscale,
    )
    from cs686_big_data_p1_spark.tables import load_table
    from tests.conftest import SF_MED

    got = {
        r.o_orderpriority: (r.n_sampled, r.est_total, r.stderr)
        for r in aqp_revenue(spark, SF_MED).collect()
    }
    true = {
        r.o_orderpriority: r.t
        for r in load_table(spark, SF_MED, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum(s6("o_totalprice")).alias("_t"))
        .select("o_orderpriority", unscale("_t", 6).alias("t"))
        .collect()
    }
    assert got, "sample produced no groups"
    for prio, (n, est, se) in got.items():
        assert n > 0 and se > 0 and math.isfinite(se)
        assert abs(est - true[prio]) <= 4 * se, (prio, est, true[prio], se)


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-50, 50)),  # value (w/ NULLs)
            st.integers(0, 10_000),                      # tie (unique-ified)
        ),
        min_size=1,
        max_size=120,
    ),
    desc=st.booleans(),
)
@_SETTINGS
def test_two_phase_rank_equals_builtin_under_hypothesis(spark, rows, desc):
    """r8 rank rewrite, property form: for ANY value distribution —
    heavy ties, NULLs, negatives, singletons — and both directions,
    the distributed two-phase rank equals the single-window built-in
    row-for-row."""
    from pyspark.sql.window import Window

    from cs686_big_data_p1_spark.operators.analytics import (
        _two_phase_global_rank,
    )

    data = [(v, 1_000_000 * i + t) for i, (v, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "v long, tie long")
    got = {
        r.tie: r["_rank"]
        for r in _two_phase_global_rank(df, "v", "tie", desc=desc).collect()
    }
    order = F.desc("v") if desc else F.asc("v")
    want = {
        r.tie: r.rn
        for r in df.withColumn(
            "rn",
            F.row_number()
            .over(Window.orderBy(order, F.asc("tie")))
            .cast("bigint"),
        ).collect()
    }
    assert got == want
