"""Round-over-round bench comparison: spot per-query regressions.

Usage: python tools/bench_compare.py OLD_DETAIL.json [NEW_DETAIL.json]

NEW defaults to the repo's current BENCH_DETAIL.json. Prints queries
whose min-of-2 time grew by more than THRESHOLD vs the old artifact
(plus new/removed queries), so a plan regression is distinguishable
from fixture or corpus growth at a glance. Regression output is
informational (exit 0; the per-round judge call is a human one —
r5's lesson: a 3x "regression" was machine contention, which min-of-2
timing now defends against at the source) — EXCEPT a scale-factor
mismatch between the two artifacts, which exits 2: comparing across
SFs is the exact mislabeling that poisoned the r7 series (VERDICT r8
#8), and no number printed from it would mean anything.
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 1.5
MIN_SECONDS = 0.3  # ignore ratio noise on sub-300ms queries


def main() -> int:
    old_path = sys.argv[1]
    new_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    old_doc = json.load(open(old_path))
    new_doc = json.load(open(new_path))
    # SF guard (VERDICT r8 #8): r7's "idle 97.2 s" was an sf0.01 run
    # mislabeled into the sf0.1 series. A comparison across scale
    # factors is not a regression check at all — refuse it loudly
    # (exit 2) rather than print ratios that poison the series.
    old_sf, new_sf = old_doc.get("sf"), new_doc.get("sf")
    if old_sf is not None and new_sf is not None and old_sf != new_sf:
        print(
            f"SF MISMATCH: {old_path} is sf={old_sf} but {new_path} is "
            f"sf={new_sf} — these are different series; refusing to "
            "compare (re-run bench.py with the matching "
            "SPARK_GRAFT_SF_DIR)"
        )
        return 2
    # Contention tag (VERDICT r9 #5): bench.py marks a run that STARTED
    # on a loaded box. Ratios against such a run are advisory at best —
    # warn loudly so nobody reads a contended artifact as a regression.
    for label, doc, path in (("old", old_doc, old_path), ("new", new_doc, new_path)):
        if doc.get("contended"):
            print(
                f"WARNING: {label} artifact {path} is tagged contended=true "
                f"(loadavg_at_start={doc.get('loadavg_at_start')}); "
                "per-query ratios below are unreliable"
            )
    old = old_doc["queries"]
    new = new_doc["queries"]
    common = sorted(set(old) & set(new))
    old_t = sum(v for q, v in old.items() if q in common and v > 0)
    new_t = sum(v for q, v in new.items() if q in common and v > 0)
    print(
        f"common queries: {len(common)}  "
        f"old {old_t:.1f}s -> new {new_t:.1f}s "
        f"({new_t / old_t:.2f}x)" if old_t else "no common queries"
    )
    regs = [
        (new[q] / old[q], q)
        for q in common
        if old[q] >= MIN_SECONDS and new[q] > old[q] * THRESHOLD
    ]
    for r, q in sorted(regs, reverse=True):
        print(f"  REGRESSED {q}: {old[q]:.2f}s -> {new[q]:.2f}s ({r:.2f}x)")
    if not regs:
        print(f"  no query regressed >{THRESHOLD}x (floor {MIN_SECONDS}s)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"  new queries: {', '.join(added)}")
    if removed:
        print(f"  removed queries: {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
