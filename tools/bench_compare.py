"""Round-over-round bench comparison: spot per-query regressions.

Usage: python tools/bench_compare.py OLD_DETAIL.json [NEW_DETAIL.json]

NEW defaults to the repo's current BENCH_DETAIL.json. Prints queries
whose min-of-2 time grew by more than THRESHOLD vs the old artifact
(plus new/removed queries), so a plan regression is distinguishable
from fixture or corpus growth at a glance. Informational — always
exits 0; the per-round judge call is a human one (r5's lesson: a 3x
"regression" was machine contention, which min-of-2 timing now
defends against at the source).
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 1.5
MIN_SECONDS = 0.3  # ignore ratio noise on sub-300ms queries


def main() -> int:
    old_path = sys.argv[1]
    new_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL.json"
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
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
