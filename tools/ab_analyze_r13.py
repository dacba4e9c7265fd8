#!/usr/bin/env python3
"""Paired A/B analysis for the r12-vs-r13 bench adjudication.

Reads target/ab/{r12b,r13}_rep{1..3}.json (graft.Bench single-line
JSON; r12b = round-12 final HEAD 9fdba31 built in a worktree, r13 =
current HEAD), computes per-query min-over-reps for each body, the
common-set ratio distribution, and a paired per-rep view (rep i of
r12b vs rep i of r13, adjacent in time) that separates drift-over-
session from a code delta. Writes AB_r12_r13.json.
"""
import json
import statistics

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
    for body in ("r12b", "r13"):
        reps[body] = [load(f"{OUT}/{body}_rep{i}.json") for i in (1, 2, 3)]
    qa = {}
    qb = {}
    for body, dst in (("r12b", qa), ("r13", qb)):
        for rep in reps[body]:
            for k, v in rep["queries"].items():
                if v > 0:
                    dst.setdefault(k, []).append(v)
    common = sorted(k for k in qa if k in qb)
    ratios = {k: min(qb[k]) / min(qa[k]) for k in common}
    med = statistics.median(ratios.values())
    print(f"common set: {len(common)} queries")
    print(f"min-over-3-reps median ratio r13/r12b: {med:.3f}")
    srt = sorted(ratios.items(), key=lambda kv: kv[1])
    for k, r in srt[:5]:
        print(f"  {r:5.2f} {k} ({min(qa[k]):.2f}->{min(qb[k]):.2f})")
    print("  ...")
    for k, r in srt[-5:]:
        print(f"  {r:5.2f} {k} ({min(qa[k]):.2f}->{min(qb[k]):.2f})")
    # paired per-rep medians: each rep pair is adjacent in time, so a
    # box-load drift shows as rep-to-rep spread here while a code delta
    # shows as a consistent offset in every pair
    paired = []
    for i in range(3):
        ra = reps["r12b"][i]["queries"]
        rb = reps["r13"][i]["queries"]
        rr = [rb[k] / ra[k] for k in common
              if ra.get(k, 0) > 0 and rb.get(k, 0) > 0]
        paired.append(round(statistics.median(rr), 4))
        print(f"rep {i+1}: paired median {paired[-1]:.3f} "
              f"(load r12b={reps['r12b'][i].get('load_before')} "
              f"r13={reps['r13'][i].get('load_before')})")
    for body in ("r12b", "r13"):
        tot = [r.get("value") for r in reps[body]]
        print(f"{body} suite totals: {tot}")
    # scheme-bias decomposition: the r13 body in THIS A/B ran the
    # round-13 A/A trial scheme (two interleaved passes), whose pass-2
    # samples are minutes colder than r12's back-to-back second runs —
    # so compare like-for-like FIRST samples (both cold) per rep: flat
    # sample-1 ratios with inflated min ratios prove the gap is the
    # measurement scheme, not the code. (The A/A was reverted on this
    # evidence; see BASELINE.md round-13.)
    s1_medians = []
    for i in range(3):
        ra = reps["r12b"][i].get("runs", {})
        rb = reps["r13"][i].get("runs", {})
        s1 = [rb[k][0] / ra[k][0] for k in common
              if len(ra.get(k, [])) > 0 and len(rb.get(k, [])) > 0
              and ra[k][0] > 0]
        s1_medians.append(round(statistics.median(s1), 4))
        print(f"rep {i+1}: like-for-like FIRST-sample median "
              f"{s1_medians[-1]:.3f}")
    summary = {
        "bodies": {"r12b": "9fdba31 (round-12 final HEAD, worktree)",
                   "r13": "round-13 HEAD (A/A trial scheme — see note)"},
        "scheme_note": "r13 body ran the A/A two-pass trial; its "
            "per-query mins are systematically ~1.2x high vs "
            "back-to-back mins. first_sample_medians compares "
            "like-for-like cold samples.",
        "first_sample_medians": s1_medians,
        "common_n": len(common),
        "median_min_ratio": round(med, 4),
        "paired_medians": paired,
        "loads": {b: [reps[b][i].get("load_before") for i in range(3)]
                  for b in ("r12b", "r13")},
        "totals": {b: [reps[b][i].get("value") for i in range(3)]
                   for b in ("r12b", "r13")},
        "worst": srt[-8:],
        "best": srt[:8],
    }
    with open("/root/repo/AB_r12_r13.json", "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print("wrote /root/repo/AB_r12_r13.json")


if __name__ == "__main__":
    main()
