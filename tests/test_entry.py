from __future__ import annotations

from tests.conftest import SF_SMALL


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_has_callable_and_runs(spark, registry):
    qs = registry.QUERIES
    assert len(qs) >= 5
    for name, fn in qs.items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name


def test_oracles_reference_registered_queries(registry):
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_bench_run_timed_takes_min_of_passes(spark):
    """bench.run_timed is the artifact-of-record mechanism: it must
    execute the query once per pass and record the MINIMUM (the r5
    official bench was contamination-distorted 2.4x; min-of-2 is the
    defense), clearing per-query scratch caches between passes."""
    import bench
    from cs686_big_data_p1_spark import registry as reg

    calls = []

    def fake_query(s, sf_dir):
        calls.append(sf_dir)
        return s.range(3)

    real = bench.run_one
    ticks = iter([5.0, 1.0])
    bench.run_one = lambda s, fn, sf: (fn(s, sf), next(ticks))[1]
    try:
        got = bench.run_timed(spark, fake_query, "sfX", passes=2)
    finally:
        bench.run_one = real
    assert got == 1.0  # min, not first or mean
    assert calls == ["sfX", "sfX"]  # both passes really ran
    assert reg.TRACKED_CACHES == []  # clear_caches ran between passes


def test_bench_compare_refuses_sf_mismatch(tmp_path):
    """VERDICT r8 #8: comparing bench artifacts from different scale
    factors (the r7 mislabeling) must exit 2 with a loud message, not
    print meaningless ratios; same-SF artifacts compare normally."""
    import json
    import subprocess
    import sys

    a = tmp_path / "old.json"
    b = tmp_path / "new.json"
    a.write_text(json.dumps({"sf": 0.1, "queries": {"q": 1.0}}))
    b.write_text(json.dumps({"sf": 0.01, "queries": {"q": 0.1}}))
    r = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(a), str(b)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 2
    assert "SF MISMATCH" in r.stdout

    b.write_text(json.dumps({"sf": 0.1, "queries": {"q": 0.9}}))
    r = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(a), str(b)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0
    assert "SF MISMATCH" not in r.stdout
