#!/usr/bin/env python3
"""Paired A/B analysis for the r10-vs-r11 bench adjudication.

Reads target/ab/{r10,r11}_rep{1..3}.json (graft.Bench single-line JSON),
computes per-query min-over-reps for each body, the common-set ratio
distribution, and a paired per-rep view (rep i of r10 vs rep i of r11,
adjacent in time) that separates drift-over-session from a code delta.
"""
import json, statistics

OUT = "/root/repo/target/ab"

def load(path):
    with open(path) as f:
        txt = f.read().strip()
    for line in reversed(txt.splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")

def main():
    reps = {}
    for body in ("r10", "r11"):
        reps[body] = [load(f"{OUT}/{body}_rep{i}.json") for i in (1, 2, 3)]
    q10 = {}
    q11 = {}
    for body, dst in (("r10", q10), ("r11", q11)):
        for rep in reps[body]:
            for k, v in rep["queries"].items():
                if v > 0:
                    dst.setdefault(k, []).append(v)
    common = sorted(k for k in q10 if k in q11)
    ratios = {k: min(q11[k]) / min(q10[k]) for k in common}
    med = statistics.median(ratios.values())
    print(f"common set: {len(common)} queries")
    print(f"min-over-3-reps median ratio r11/r10: {med:.3f}")
    srt = sorted(ratios.items(), key=lambda kv: kv[1])
    for k, r in srt[:5]:
        print(f"  {r:5.2f} {k} ({min(q10[k]):.2f}->{min(q11[k]):.2f})")
    print("  ...")
    for k, r in srt[-5:]:
        print(f"  {r:5.2f} {k} ({min(q10[k]):.2f}->{min(q11[k]):.2f})")
    # paired per-rep medians: each rep pair is adjacent in time, so a
    # box-load drift shows as rep-to-rep spread here while a code delta
    # shows as a consistent offset in every pair
    for i in range(3):
        qa = reps["r10"][i]["queries"]
        qb = reps["r11"][i]["queries"]
        rr = [qb[k] / qa[k] for k in common if qa.get(k, 0) > 0 and qb.get(k, 0) > 0]
        la = reps["r10"][i].get("load_before")
        lb = reps["r11"][i].get("load_before")
        print(f"rep {i+1}: paired median {statistics.median(rr):.3f} "
              f"(load r10={la} r11={lb})")
    # totals for context
    for body in ("r10", "r11"):
        tot = [r.get("value") for r in reps[body]]
        print(f"{body} suite totals: {tot}")
    summary = {
        "common_n": len(common),
        "median_min_ratio": round(med, 4),
        "paired_medians": [
            round(statistics.median(
                [reps["r11"][i]["queries"][k] / reps["r10"][i]["queries"][k]
                 for k in common
                 if reps["r10"][i]["queries"].get(k, 0) > 0
                 and reps["r11"][i]["queries"].get(k, 0) > 0]), 4)
            for i in range(3)],
        "loads": {b: [reps[b][i].get("load_before") for i in range(3)]
                  for b in ("r10", "r11")},
        "totals": {b: [reps[b][i].get("value") for i in range(3)]
                   for b in ("r10", "r11")},
        "worst": srt[-8:],
        "best": srt[:8],
    }
    with open(f"{OUT}/ab_summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {OUT}/ab_summary.json")

if __name__ == "__main__":
    main()
