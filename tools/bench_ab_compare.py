"""Interleaved A/B like-for-like comparison (VERDICT r13 #1).

Usage: python tools/bench_ab_compare.py bench_ab/BENCH_AB_r13_run1.json \
           bench_ab/BENCH_AB_r13_run2.json -- \
           bench_ab/BENCH_AB_r14_run1.json bench_ab/BENCH_AB_r14_run2.json

Takes the per-query FLOOR across each tree's runs (each run is already
min-of-2 passes), restricts to the query set common to both trees, and
prints the like-for-like total ratio plus any query whose floor grew
>1.5x AND >0.5 s — the named-causes list the ledger row must carry.
"""
from __future__ import annotations

import json
import sys


def floors(paths):
    qs: dict[str, float] = {}
    sf = None
    for p in paths:
        d = json.load(open(p))
        sf = d["sf"] if sf is None else sf
        assert d["sf"] == sf, f"SF mismatch in {p}"
        for k, v in d["queries"].items():
            if v > 0:
                qs[k] = min(qs.get(k, float("inf")), v)
    return qs, sf


def main() -> int:
    sep = sys.argv.index("--")
    a_paths, b_paths = sys.argv[1:sep], sys.argv[sep + 1:]
    a, sf_a = floors(a_paths)
    b, sf_b = floors(b_paths)
    assert sf_a == sf_b, "cross-SF comparison refused"
    common = sorted(set(a) & set(b))
    ta = sum(a[q] for q in common)
    tb = sum(b[q] for q in common)
    print(f"sf={sf_a} common={len(common)} "
          f"A_floor={ta:.2f}s B_floor={tb:.2f}s ratio B/A={tb/ta:.3f}")
    new = sorted(set(b) - set(a))
    if new:
        print(f"B-only queries ({len(new)}): "
              + ", ".join(f"{q}={b[q]:.2f}s" for q in new)
              + f" | combined {sum(b[q] for q in new):.2f}s")
    flagged = [
        (q, a[q], b[q]) for q in common
        if b[q] > 1.5 * a[q] and b[q] - a[q] > 0.5
    ]
    for q, x, y in sorted(flagged, key=lambda t: t[1] - t[2]):
        print(f"  REGRESSED {q}: {x:.2f} -> {y:.2f} s")
    if not flagged:
        print("  zero per-query regressions >1.5x & >0.5s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
