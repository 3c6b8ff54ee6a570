"""The full-oracle correctness gate (VERDICT r7 next-round #1).

The driver's CORRECTNESS_r*.json only covers the first 50 registered
queries; the other ~130 are verified by the full DuckDB sweep
`tools/check_oracle.py --json ORACLE_SWEEP.json /root/testdata/sf0.001`,
whose committed artifact this test pins against the LIVE registry:

  * the artifact must exist, parse, and contain zero failures;
  * its query-name set must EXACTLY equal the registry's — registering,
    removing, or renaming a query without re-running the sweep fails
    here;
  * its ok/rows-only split must match the registry's oracle set — adding
    or dropping an oracle_sql() entry without re-sweeping fails here.

So the artifact cannot silently go stale with respect to the code that
matters (the registry surface). A behavior change to an EXISTING query
still requires re-running the sweep to be caught at sf0.001 — that is
the per-round gate the builder runs before committing (recorded in
SCALING.md); this test makes forgetting it loud whenever the registry
moves, which every round does.
"""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
ARTIFACT = REPO / "ORACLE_SWEEP.json"


def test_oracle_sweep_artifact_matches_registry(registry):
    assert ARTIFACT.exists(), (
        "ORACLE_SWEEP.json missing — run "
        "`python tools/check_oracle.py --json ORACLE_SWEEP.json "
        "/root/testdata/sf0.001` and commit the result"
    )
    data = json.loads(ARTIFACT.read_text())
    assert data["n_failed"] == 0, {
        n: r for n, r in data["queries"].items() if r["status"] == "fail"
    }

    swept = set(data["queries"])
    live = set(registry.QUERIES)
    assert swept == live, (
        f"registry changed since last sweep: "
        f"new={sorted(live - swept)} removed={sorted(swept - live)} — "
        "re-run the full oracle sweep"
    )

    swept_ok = {n for n, r in data["queries"].items() if r["status"] == "ok"}
    live_oracled = set(registry.ORACLES)
    assert swept_ok == live_oracled, (
        f"oracle set changed since last sweep: "
        f"new={sorted(live_oracled - swept_ok)} "
        f"dropped={sorted(swept_ok - live_oracled)} — re-run the sweep"
    )

    rows_only = {
        n for n, r in data["queries"].items() if r["status"] == "rows_only"
    }
    assert rows_only == live - live_oracled


def test_live_oracle_smoke(spark, registry):
    """Per-commit live slice of the full sweep: ten representative
    queries — one per operator family, biased toward the paths that
    change most — re-verified against their DuckDB oracles at sf0.001
    on every suite run. The committed-artifact test above catches
    registry drift; this one catches behavior regressions in EXISTING
    queries between full sweeps (the r7 verdict's residual caveat).
    Reuses tools/check_oracle's exact compare."""
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from check_oracle import compare, duck_con

    SMOKE = [
        "tpch_q9_profit",       # derived-partsupp TPC-H
        "corpus_curate",        # the full curation DAG
        "customer_rfm",         # two-phase global rank x3
        "heavy_hitters",        # two-pass Misra-Gries
        "bm25_search",          # retrieval scoring
        "pagerank_copurchase",  # bit-exact iterative graph
        "lm_score",             # pruned bigram LM (r8)
        "coverage_time",        # densified sweep line (r8)
        "dedup_near",           # MinHash-LSH
        "ohlc_hourly",          # struct-keyed edge aggregation (r8)
    ]
    con = duck_con("/root/testdata/sf0.001")
    failures = []
    for name in SMOKE:
        sdf = registry.QUERIES[name](spark, "/root/testdata/sf0.001").toPandas()
        registry.clear_caches()
        odf = con.execute(registry.ORACLES[name]).fetchdf()
        problems = compare(name, sdf, odf)
        if problems:
            failures.append(f"{name}: " + "; ".join(problems))
    assert not failures, failures
