"""Physical-plan audit: assert the plan properties the 100 TB design
rules require (SURVEY.md §4.3) and dump the formatted plans.

Checks, per audited query:
  * scan pruning   — every parquet scan's ReadSchema carries only a
                     subset of columns (no SELECT * scans) when the
                     query projects;
  * broadcast      — queries joining a small dimension show
                     BroadcastHashJoin / BroadcastExchange, not a
                     SortMergeJoin on the dim side;
  * codegen        — at least one WholeStageCodegen span (the scan+
                     filter+project pipeline is compiled, not
                     interpreted);
  * no cartesian   — no CartesianProduct node anywhere (cross joins
                     must be broadcast-nested-loop over a broadcast
                     side).

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md
Exit code 1 if any assertion fails.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# query -> properties to assert. broadcast: the query joins a
# broadcast-worthy side; pruned: a parquet scan must read a strict
# column subset.
AUDITS: dict[str, dict] = {
    "tpch_q1_pricing": {"pruned": True, "codegen": True},
    "tpch_q3_shipping": {"pruned": True, "broadcast": True, "codegen": True},
    "tpch_q5_localsupp": {"pruned": True, "broadcast": True, "codegen": True},
    "topk_orders_per_customer": {"pruned": True, "codegen": True},
    "dead_nodes": {"broadcast": True, "codegen": True},
    "replicas_on_offline_nodes": {"broadcast": True, "codegen": True},
    "under_replicated": {"codegen": True},
    "checksum_join": {"codegen": True},
    "dedup_exact": {"pruned": True, "codegen": True},
    "dedup_near": {"codegen": True},
    "ann_lsh": {"broadcast": True},
    "knn_ivf": {"broadcast": True},
    "doc_embedding_join": {"pruned": True, "codegen": True},
    "hb_tumbling": {"codegen": True},
}


def formatted_plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def main() -> int:
    from cs686_big_data_p1_spark import registry
    from cs686_big_data_p1_spark.session import get_spark
    from cs686_big_data_p1_spark.tables import SCHEMAS

    registry.load_all()
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    max_cols = max(len(s.fields) for s in SCHEMAS.values())
    failures: list[str] = []
    print("# Physical plan audit\n")
    print(f"sf_dir: `{SF_DIR}`\n")
    for name, want in AUDITS.items():
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = formatted_plan(df)
        problems = []
        if want.get("pruned"):
            schemas = read_schemas(plan)
            if not schemas:
                problems.append("no parquet ReadSchema found")
            elif all(len(s.split(",")) >= max_cols for s in schemas):
                problems.append("every scan reads all columns (no pruning)")
        if want.get("broadcast") and "Broadcast" not in plan:
            problems.append("no broadcast join in plan")
        if want.get("codegen"):
            # under AQE the un-executed plan exposes no codegen
            # subtrees; compile with AQE off (each AQE stage compiles
            # the same spans at runtime)
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                cg = formatted_plan(
                    registry.QUERIES[name](spark, SF_DIR), mode="codegen"
                )
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
            if not m or int(m.group(1)) < 1:
                problems.append("no WholeStageCodegen span")
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct in plan")
        status = "FAIL: " + "; ".join(problems) if problems else "ok"
        print(f"## {name} — {status}\n")
        print("```")
        print(plan.strip())
        print("```\n")
        if problems:
            failures.append(name)
    if failures:
        print(f"\nFAILED: {failures}", file=sys.stderr)
        return 1
    print(f"\nall {len(AUDITS)} audited plans ok", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
