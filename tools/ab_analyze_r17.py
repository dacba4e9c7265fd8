#!/usr/bin/env python3
"""Summarize a tools/ab_opt17.sh output dir: per-query min-over-reps for
each arm, ratio new/old, plus per-rep pairs for drift reading.

Usage: python3 tools/ab_analyze_r17.py <dir> [out.json]
"""
import glob
import json
import math
import sys


def arm(d, pfx):
    per = {}
    for f in sorted(glob.glob(f"{d}/{pfx}_rep*.json")):
        try:
            j = json.load(open(f))
        except Exception:
            continue
        for q, v in j.get("queries", {}).items():
            if v >= 0:
                per.setdefault(q, []).append(v)
    return per


def main():
    d = sys.argv[1]
    old, new = arm(d, "old"), arm(d, "new")
    rows = []
    for q in sorted(set(old) | set(new)):
        o = min(old.get(q, [math.inf]))
        n = min(new.get(q, [math.inf]))
        rows.append((q, o, n, n / o if o > 0 else None))
    print(f"{'query':42s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
    ratios = []
    for q, o, n, r in rows:
        print(f"{q:42s} {o:7.3f} {n:7.3f} {r:6.3f}" if r else f"{q} ?")
        if r:
            ratios.append(r)
    gm = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    to, tn = sum(r[1] for r in rows), sum(r[2] for r in rows)
    print(f"\ntotal old {to:.1f}s new {tn:.1f}s ratio {tn/to:.3f} "
          f"geomean {gm:.3f} over {len(ratios)} queries")
    if len(sys.argv) > 2:
        json.dump({"per_query": {q: {"old": o, "new": n, "ratio": r}
                                 for q, o, n, r in rows},
                   "total_old": to, "total_new": tn,
                   "geomean": gm,
                   "old_runs": old, "new_runs": new},
                  open(sys.argv[2], "w"), indent=1)


main()
