"""Micro-bench a named subset of registered queries (optimization aid).

Same methodology as bench.py (noop sink, min-of-N passes, caches
cleared between passes) but only for the queries named on the command
line — used for the per-site A/B adjudication the full-suite harness is
too slow for. NOT the driver's bench: bench.py and its contract are
untouched (VERDICT r15 protocol).

Usage: python tools/bench_subset.py [--passes N] query [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from cs686_big_data_p1_spark import registry
from cs686_big_data_p1_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    passes = 2
    if args and args[0] == "--passes":
        passes = int(args[1])
        args = args[2:]
    registry.load_all()
    names = args
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    # Same warm-up class as bench.py: JVM + parquet footers + python
    # worker pool + session-long DFS views, so the first named query
    # doesn't absorb fixed costs.
    from cs686_big_data_p1_spark import views

    registry.QUERIES["tpch_q1_pricing"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    for build in (
        views.chunks_df,
        views.replicas_df,
        views.heartbeats_df,
        views.checksums_stored_df,
        views.free_space_df,
        views.nodes_df,
    ):
        build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    registry.clear_caches()

    times: dict[str, float] = {}
    for name in names:
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(passes):
            spark.sparkContext.setJobDescription(f"subset:{name}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            registry.clear_caches()
        times[name] = round(best, 4)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "passes": passes,
                "loadavg_1m": round(os.getloadavg()[0], 2),
                "queries": times,
                "total": round(sum(times.values()), 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
