"""Total-order sort library (sources/sort.py): global order across
output files, pinned-boundary determinism, and composite-key
lexicographic placement."""

from __future__ import annotations

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cs686_big_data_p1_spark.sources.sort import (
    range_boundaries,
    total_order_sort,
    total_order_sort_pinned,
    write_sorted,
)
from tests.conftest import SF_SMALL


def _assert_global_file_order(path: str, cols: list[str], n_rows: int):
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) > 1, "want a multi-file layout to prove cross-file order"
    prev_max = None
    total = 0
    for f in files:
        pdf = pd.read_parquet(f, columns=cols)
        total += len(pdf)
        if len(pdf) == 0:
            continue
        keys = list(pdf.itertuples(index=False, name=None))
        assert keys == sorted(keys), f"{f} not sorted within file"
        if prev_max is not None:
            assert prev_max <= keys[0], f"file order broken at {f}"
        prev_max = keys[-1]
    assert total == n_rows


def test_total_order_sort_native_layout(spark, tmp_path):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderdate", "o_orderkey"
    )
    n = o.count()
    path = str(tmp_path / "sorted")
    write_sorted(o, ["o_orderdate", "o_orderkey"], path, num_partitions=8)
    _assert_global_file_order(path, ["o_orderdate", "o_orderkey"], n)


def test_pinned_boundaries_deterministic_and_sorted(spark, tmp_path):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_custkey", "o_orderkey"
    )
    n = o.count()
    b1 = range_boundaries(o, ["o_custkey", "o_orderkey"], 8, seed=42)
    b2 = range_boundaries(o, ["o_custkey", "o_orderkey"], 8, seed=42)
    assert b1 == b2, "same seed must pin the same boundaries"
    assert 1 <= len(b1) <= 7
    assert b1 == sorted(b1)

    path = str(tmp_path / "pinned")
    write_sorted(o, ["o_custkey", "o_orderkey"], path, boundaries=b1)
    _assert_global_file_order(path, ["o_custkey", "o_orderkey"], n)

    # placement honors the pinned boundaries exactly: recompute each
    # row's expected partition id and compare against file membership
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    import bisect

    seen = {}
    for idx, f in enumerate(files):
        for key in pd.read_parquet(
            f, columns=["o_custkey", "o_orderkey"]
        ).itertuples(index=False, name=None):
            seen[key] = idx
    for key, fidx in seen.items():
        want_pid = bisect.bisect_left(b1, key)
        # exchange may merge adjacent ids into one file but never
        # reorder: file index must be monotone in want_pid
        seen[key] = (fidx, want_pid)
    pairs = sorted(seen.values(), key=lambda t: t[1])
    fidxs = [p[0] for p in pairs]
    assert fidxs == sorted(fidxs)


def test_pinned_sort_equals_full_sort(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 97).alias("a"),
        (F.col("id") * 31 % 1009).alias("b"),
        F.col("id"),
    )
    bounds = range_boundaries(df, ["a", "b"], 16, seed=7)
    got = [
        (r.a, r.b, r.id)
        for r in total_order_sort_pinned(df, ["a", "b"], bounds)
        .toLocalIterator()
    ]
    # partition-concat order must already equal the global sort order
    # on the key prefix (full tuples may tie on (a, b))
    assert [(a, b) for a, b, _ in got] == sorted(
        [(a, b) for a, b, _ in got]
    )
    assert sorted(got) == sorted(
        (r.a, r.b, r.id) for r in df.collect()
    )


def test_empty_and_single_partition_degenerate(spark, tmp_path):
    empty = spark.range(0).select(F.col("id").alias("a"))
    assert range_boundaries(empty, ["a"], 8, seed=1) == []
    assert total_order_sort(empty, ["a"], 4).count() == 0
    one = spark.range(5).select(F.col("id").alias("a"))
    assert range_boundaries(one, ["a"], 1, seed=1) == []
    got = [r.a for r in total_order_sort_pinned(one, ["a"], []).collect()]
    assert got == [0, 1, 2, 3, 4]


def test_heavily_tied_keys_degrade_to_fewer_partitions(spark):
    df = spark.range(5_000).select(F.lit(1).alias("a"), F.col("id"))
    bounds = range_boundaries(df, ["a"], 8, seed=3)
    # one distinct key -> at most one (deduped) boundary
    assert len(bounds) <= 1
    out = total_order_sort_pinned(df, ["a"], bounds)
    assert out.count() == 5_000


@pytest.mark.parametrize("seed_a,seed_b", [(1, 2)])
def test_different_seeds_may_move_boundaries(spark, seed_a, seed_b):
    df = spark.range(50_000).select(
        F.xxhash64("id").alias("a"), F.col("id")
    )
    ba = range_boundaries(df, ["a", "id"], 8, seed=seed_a)
    bb = range_boundaries(df, ["a", "id"], 8, seed=seed_b)
    assert ba != bb, "distinct seeds on a dense key space should differ"


def test_null_keys_place_first_and_never_become_boundaries(spark):
    df = spark.range(2_000).select(
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") % 101)
        .cast("long")
        .alias("a"),
        F.col("id"),
    )
    bounds = range_boundaries(df, ["a", "id"], 8, seed=5)
    assert all(all(v is not None for v in b) for b in bounds)
    out = total_order_sort_pinned(df, ["a", "id"], bounds)
    keys = [r.a for r in out.toLocalIterator()]
    n_null = sum(1 for k in keys if k is None)
    assert n_null == 2_000 // 7 + 1
    assert all(k is None for k in keys[:n_null]), "NULLs must sort first"
    nonnull = [k for k in keys if k is not None]
    assert nonnull == sorted(nonnull)


def test_null_in_secondary_key_keeps_global_order(spark):
    """A NULL in a NON-leading key column must not derail placement:
    (5, NULL) sorts before (5, 10) but after (3, 7) — the null-safe
    comparison keeps the pid monotone."""
    rows = [(5, None), (3, 7), (5, 10), (1, 1), (9, 2), (5, 3)]
    df = spark.createDataFrame(rows, "a long, b long")
    bounds = [(5, 10)]  # hand-pinned: splits exactly at the tricky spot
    got = [
        (r.a, r.b)
        for r in total_order_sort_pinned(df, ["a", "b"], bounds)
        .toLocalIterator()
    ]
    key = lambda t: (t[0], t[1] is not None, t[1] or 0)  # noqa: E731
    assert got == sorted(rows, key=key)
