#!/usr/bin/env python3
"""Analyze the round-16 optimization A/B (tools/ab_opt16.sh) into
AB_opt_r16.json: per-query min-over-reps for both arms, ratios,
medians (all / multi-second rows), and the per-rep paired medians."""
import json, glob, statistics, sys, os

OUT = "/root/repo/target/opt16/ab"


def load(arm):
    best, reps = {}, []
    for f in sorted(glob.glob(f"{OUT}/{arm}_rep*.json")):
        d = json.load(open(f))
        reps.append(d)
        for k, v in d["queries"].items():
            if v >= 0:
                best[k] = min(best.get(k, 1e18), v)
    return best, reps


old, oreps = load("old")
new, nreps = load("new")
common = sorted(set(old) & set(new))
ratios = {k: new[k] / old[k] for k in common if old[k] > 0}
multi = {k: r for k, r in ratios.items() if old[k] >= 1.0}
rep_medians = []
for od, nd in zip(oreps, nreps):
    rs = [nd["queries"][k] / od["queries"][k]
          for k in common
          if od["queries"].get(k, 0) > 0 and nd["queries"].get(k, -1) >= 0]
    rep_medians.append(round(statistics.median(rs), 3))
result = {
    "protocol": "same-session alternation, full suite sf0.1/32cpus, "
                "direct java, min over reps per arm",
    "old_sha": "1fafd14 (session-start HEAD, inherited round-16 build)",
    "new": "round-16 optimization body",
    "n_common": len(common),
    "old_total_min": round(sum(old[k] for k in common), 1),
    "new_total_min": round(sum(new[k] for k in common), 1),
    "median_ratio": round(statistics.median(ratios.values()), 3),
    "median_ratio_multisecond": round(statistics.median(multi.values()), 3)
    if multi else None,
    "paired_rep_medians": rep_medians,
    "errors_old": {k: v for d in oreps for k, v in d["errors"].items()},
    "errors_new": {k: v for d in nreps for k, v in d["errors"].items()},
    "top_improved": sorted(
        ({"q": k, "ratio": round(r, 3), "old": old[k], "new": new[k]}
         for k, r in ratios.items()), key=lambda x: x["ratio"])[:20],
    "top_regressed": sorted(
        ({"q": k, "ratio": round(r, 3), "old": old[k], "new": new[k]}
         for k, r in ratios.items()), key=lambda x: -x["ratio"])[:10],
    "queries": {k: {"old": old[k], "new": new[k],
                    "ratio": round(ratios[k], 3)} for k in common},
}
out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/AB_opt_r16.json"
json.dump(result, open(out, "w"), indent=1)
print(f"wrote {out}: n={result['n_common']} median={result['median_ratio']} "
      f"multi-sec median={result['median_ratio_multisecond']} "
      f"totals {result['old_total_min']} -> {result['new_total_min']} "
      f"rep medians {rep_medians}")
