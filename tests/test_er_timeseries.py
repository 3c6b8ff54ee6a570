"""Pins for the entity-resolution and time-series operators
(operators/er.py, operators/timeseries.py) plus the PQ encoder and
incremental dedup added alongside them: blocking recall on planted
variants, dense-grid/forward-fill invariants on the real fixture,
code determinism, and batch-vs-reference survivor logic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_MED, SF_SMALL


def _write_parts(tmp_path, names):
    pd.DataFrame(
        [
            (i, n, f"Brand#{i % 5}", "STANDARD", 1 + i % 50, 100.0 + i)
            for i, n in enumerate(names)
        ],
        columns=[
            "p_partkey", "p_name", "p_brand", "p_type", "p_size",
            "p_retailprice",
        ],
    ).to_parquet(str(tmp_path / "part.parquet"), index=False)
    return str(tmp_path)


def test_fuzzy_match_finds_variants_across_either_token(spark, registry, tmp_path):
    """Multi-pass blocking: a pair differing in the FIRST token is
    invisible to the first-token block and must be recovered by the
    last-token pass (and vice versa); unrelated names never pair."""
    sf = _write_parts(
        tmp_path,
        [
            "cold widget",
            "old widget",   # first token differs (dist 1) — needs k2 pass
            "old widgets",  # last token differs (dist 1) — needs k1 pass
            "red anvil",    # unrelated to widgets
            "red anvi",     # dist 1 to red anvil — k1 pass
        ],
    )
    rows = registry.QUERIES["fuzzy_name_match"](spark, sf).collect()
    pairs = {(r.a_name, r.b_name): r.edit_dist for r in rows}
    assert pairs[("cold widget", "old widget")] == 1
    assert pairs[("old widget", "old widgets")] == 1
    assert pairs[("red anvi", "red anvil")] == 1
    assert not any("anvi" in a and "widget" in b for (a, b) in pairs)
    # ordering contract: every pair is emitted once, a < b
    assert all(a < b for (a, b) in pairs)


def test_fuzzy_match_matches_oracle_on_fixture(spark, registry):
    """Spark and DuckDB agree pairwise on the real part table (the
    driver checks hashes; this pins the pair SET so a blocking bug
    that reorders-but-preserves-counts still fails)."""
    import duckdb

    rows = registry.QUERIES["fuzzy_name_match"](spark, SF_MED).collect()
    got = {(r.a_name, r.b_name, r.edit_dist) for r in rows}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{SF_MED}/part.parquet')"
    )
    want = set(
        map(tuple, con.execute(registry.ORACLES["fuzzy_name_match"]).fetchall())
    )
    assert got == want


def test_gapfill_grid_is_dense_and_fill_is_correct(spark, registry):
    """Per user: hourly grid is contiguous min..max, observed rows keep
    their own value, carried rows repeat the previous value, and the
    first grid row is always observed (grid starts at first activity)."""
    rows = registry.QUERIES["gapfill_ffill"](spark, SF_SMALL).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for _user, series in by_user.items():
        series.sort(key=lambda r: r.hour_ts)
        # contiguous hourly grid
        hours = [r.hour_ts for r in series]
        for a, b in zip(hours, hours[1:]):
            assert (b - a).total_seconds() == 3600
        assert series[0].is_observed == 1
        prev = None
        for r in series:
            if r.is_observed == 0:
                assert r.value_ff == prev
            prev = r.value_ff


def test_pq_encode_deterministic_and_in_range(spark, registry):
    """Seeded codebooks: two runs agree code-for-code; every code is in
    [0, PQ_K); identical vectors get identical codes."""
    from cs686_big_data_p1_spark.operators.ann import PQ_K, PQ_M

    q = registry.QUERIES["pq_encode"]
    a = {r.vec_id: tuple(r[f"code_{m}"] for m in range(PQ_M))
         for r in q(spark, SF_SMALL).collect()}
    b = {r.vec_id: tuple(r[f"code_{m}"] for m in range(PQ_M))
         for r in q(spark, SF_SMALL).collect()}
    assert a == b
    assert all(0 <= c < PQ_K for codes in a.values() for c in codes)


def test_dedup_incremental_excludes_reference_content(spark, registry):
    """Survivors are exactly the batch hashes absent from the reference
    corpus, keeper = min doc_id within the batch."""
    from cs686_big_data_p1_spark.operators.llm import INCR_SPLIT_DOC_ID

    rows = registry.QUERIES["dedup_incremental"](spark, SF_SMALL).collect()
    assert all(r.keeper_doc_id >= INCR_SPLIT_DOC_ID for r in rows)

    docs = registry.QUERIES["dedup_exact"](spark, SF_SMALL).collect()
    # dedup_exact keyed by hash over the WHOLE corpus: any hash whose
    # keeper is below the split exists in the reference, so it must not
    # survive incremental dedup.
    ref_hashes = {r.text_hash for r in docs if r.keeper_doc_id < INCR_SPLIT_DOC_ID}
    assert all(r.text_hash not in ref_hashes for r in rows)


def test_fuzzy_match_block_cap_deterministic(spark):
    """Degenerate blocking key: 120 names share one first token, 20
    over MAX_BLOCK_NAMES. The cap must truncate the block to the first
    100 names IN NAME ORDER (deterministic row_number tie-break) and
    bound candidates at C(100,2) — never C(120,2) — mirroring
    tests/test_dedup.py's bucket-cap pathology test for LSH."""
    from cs686_big_data_p1_spark.operators.er import (
        MAX_BLOCK_NAMES,
        match_names,
    )

    n_over = MAX_BLOCK_NAMES + 20
    all_names = [f"shared suffix{i:03d}" for i in range(n_over)]
    kept = set(sorted(all_names)[:MAX_BLOCK_NAMES])
    names = spark.createDataFrame([(n,) for n in all_names], "p_name string")
    rows = match_names(names).collect()
    got = {(r.a_name, r.b_name) for r in rows}
    # every digit-substitution pair has levenshtein <= 3, so the match
    # set is exactly all pairs within the capped block
    want = {
        (a, b) for a in kept for b in kept if a < b
    }
    assert got == want
    assert len(got) == MAX_BLOCK_NAMES * (MAX_BLOCK_NAMES - 1) // 2
    assert all(a in kept and b in kept for a, b in got)
    # deterministic across re-evaluation (same truncation both runs)
    assert {(r.a_name, r.b_name) for r in match_names(names).collect()} == got


def test_approx_quantiles_within_sketch_tolerance(spark, registry):
    """percentile_approx must return actual data values whose RANK is
    within the sketch's eps*n guarantee of the target rank, per group,
    and be deterministic across runs (mergeable sketch, stable for a
    fixed dataset)."""
    rows1 = {r.event_type: r for r in
             registry.QUERIES["approx_quantiles"](spark, SF_SMALL).collect()}
    rows2 = {r.event_type: r for r in
             registry.QUERIES["approx_quantiles"](spark, SF_SMALL).collect()}
    assert {(k, v.p50, v.p90) for k, v in rows1.items()} == {
        (k, v.p50, v.p90) for k, v in rows2.items()
    }

    e = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    by_type = {}
    for r in e.select("event_type", "value").collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    acc = 10000
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        assert rows1[et].n == n
        for p, got in ((0.5, rows1[et].p50), (0.9, rows1[et].p90)):
            assert got in vals, "sketch must return an actual data value"
            # all positions of `got` in the sorted list (tie span)
            lo = vals.index(got) + 1
            hi = n - vals[::-1].index(got)
            target = p * n
            slack = n / acc + 1
            assert lo - slack <= target <= hi + slack, (et, p, got, lo, hi)


def test_scd2_intervals_partition_history(spark, registry):
    """SCD2 invariants per user: intervals chain (each valid_to equals
    the next valid_from), exactly one open interval (is_current=1, the
    last), no zero-length intervals, consecutive states differ, and
    n_events totals the user's event count."""
    rows = registry.QUERIES["scd2_user_state"](spark, SF_SMALL).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    e = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    n_events = {r.user_id: r.n for r in
                e.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in ivs) == 1
        assert ivs[-1].is_current == 1 and ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state, "consecutive runs must differ"
        assert sum(r.n_events for r in ivs) == n_events[uid]


def test_cusum_flags_planted_level_shift(spark, tmp_path):
    """A user whose value jumps from 10 to 300 halfway must flag
    positions around the shift with direction -1 before (running sum
    below the global mean line) and a flat user must flag nothing."""
    import pandas as pd

    rows = []
    ts0 = pd.Timestamp("2026-01-01")
    for i in range(40):
        v = 10.0 if i < 20 else 300.0
        rows.append((i, ts0 + pd.Timedelta(minutes=i), 1, "view", v, "{}"))
    for i in range(40):  # flat user: cusum stays 0
        rows.append(
            (100 + i, ts0 + pd.Timedelta(minutes=i), 2, "view", 50.0, "{}")
        )
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)

    from cs686_big_data_p1_spark.operators.timeseries import (
        cusum_changepoints,
    )

    got = cusum_changepoints(spark, str(tmp_path)).collect()
    flagged = {r.user_id for r in got}
    assert flagged == {1}
    # mean = 155; after k steps of value 10 the deviation is k*(-145):
    # crosses 200 units at k=2, deepest at the shift (k=20, 2900 units)
    u1 = sorted((r.k, r.direction, r.cusum_dev) for r in got)
    assert u1[0][0] == 2 and all(d == -1 for _, d, _ in u1)
    deepest = max(r.cusum_dev for r in got)
    assert abs(deepest - 2900.0) < 1e-9


def test_coverage_time_matches_bruteforce_union(spark):
    """Per-day covered time must equal a driver-side interval union of
    the same sessions, clipped to day boundaries."""
    import datetime

    from cs686_big_data_p1_spark.operators.sessions import (
        coverage_time,
        event_sessionize,
    )
    from tests.conftest import SF_SMALL

    sess = [
        (r.session_start, r.session_end)
        for r in event_sessionize(spark, SF_SMALL).collect()
    ]
    # merge intervals, then clip per day
    sess.sort()
    merged = []
    for s, e in sess:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    day_cov: dict = {}
    for s, e in merged:
        d = s.replace(hour=0, minute=0, second=0, microsecond=0)
        while d <= e:
            nxt = d + datetime.timedelta(days=1)
            lo, hi = max(s, d), min(e, nxt)
            if hi > lo:
                day_cov[d] = day_cov.get(d, 0) + int(
                    (hi - lo).total_seconds() * 1_000_000
                )
            d = nxt
    got = {
        r.day: r.covered_us for r in coverage_time(spark, SF_SMALL).collect()
    }
    # densified output: every calendar day between the first and last
    # delta day appears, deltaless covered days at the full 86400 s
    delta_days = {
        t.replace(hour=0, minute=0, second=0, microsecond=0)
        for pair in sess
        for t in pair
    }
    d = min(delta_days)
    want = {}
    while d <= max(delta_days):
        want[d] = day_cov.get(d, 0)
        d += datetime.timedelta(days=1)
    assert got == want


def test_sweepline_densify_spanned_and_idle_days(spark, tmp_path):
    """ADVICE r6/r7 low: a session spanning whole calendar days must
    surface those deltaless days as fully covered (86400 s, peak =
    carry-in), and a deltaless idle gap day must surface as 0 — not
    vanish from the output."""
    import datetime

    from cs686_big_data_p1_spark.operators.sessions import (
        SESSION_GAP_S,
        coverage_time,
        max_concurrency,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    step = SESSION_GAP_S // 2
    rows = []
    # user 1: continuous beats Jan 1 12:00 -> Jan 4 12:00 (one session
    # fully spanning Jan 2 and Jan 3)
    n = (3 * 86400) // step + 1
    for i in range(n):
        rows.append((i, base + datetime.timedelta(seconds=i * step), 1,
                     "view", 0.0, "{}"))
    # user 2: one beat on Jan 7 (leaves Jan 5 + Jan 6 as idle gap days)
    rows.append((n, base + datetime.timedelta(days=6), 2, "view", 0.0,
                 "{}"))
    sf = str(tmp_path)
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(f"{sf}/events.parquet", index=False)

    day = lambda d: base.replace(hour=0) + datetime.timedelta(days=d)  # noqa: E731
    cov = {r.day: r.covered_us for r in coverage_time(spark, sf).collect()}
    assert sorted(cov) == [day(i) for i in range(7)]
    assert cov[day(1)] == 86_400_000_000  # fully spanned, no deltas
    assert cov[day(2)] == 86_400_000_000
    assert cov[day(4)] == 0  # idle gap day
    assert cov[day(5)] == 0
    assert cov[day(0)] == 12 * 3600 * 1_000_000
    assert cov[day(3)] == 12 * 3600 * 1_000_000

    peak = {
        r.day: r.peak_concurrency
        for r in max_concurrency(spark, sf).collect()
    }
    assert sorted(peak) == [day(i) for i in range(7)]
    assert peak[day(1)] == 1 and peak[day(2)] == 1  # carry-in only
    assert peak[day(4)] == 0 and peak[day(5)] == 0
    assert peak[day(3)] == 1  # ends mid-day: midnight carry counts
    assert peak[day(6)] == 1
