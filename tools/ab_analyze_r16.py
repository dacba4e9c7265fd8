#!/usr/bin/env python3
"""Analyze the r15-vs-r16 alternating A/B (target/ab16/{r15,r16}_rep*,
both bodies pinned worktrees — see tools/ab_r15_r16.sh) and write
AB_r15_r16.json. This artifact carries round 16's cross-round performance
claim: the session's quiet canonical is internally quiet but the BOX is
uniformly ~1.47x slower than the r15-early session (same-code
back-to-back suites read 1.01x vs each other), so only same-session
alternation yields a meaningful r15-vs-r16 number.

Auto-detects how many paired reps completed (>=1 required), so a
time-boxed run that finished 2 of 3 reps still analyzes cleanly."""
import glob
import json
import os
import statistics
import sys

OUT = "/root/repo/target/ab16"


def load(path):
    for line in reversed(open(path).read().strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main():
    # paired reps present for BOTH bodies, in rep order
    nreps = 0
    while (os.path.exists(f"{OUT}/r15_rep{nreps + 1}.json")
           and os.path.exists(f"{OUT}/r16_rep{nreps + 1}.json")):
        nreps += 1
    if nreps == 0:
        raise SystemExit("no completed paired reps in " + OUT)
    reps = {b: [load(f"{OUT}/{b}_rep{i}.json") for i in range(1, nreps + 1)]
            for b in ("r15", "r16")}
    qa, qb = {}, {}
    for body, dst in (("r15", qa), ("r16", qb)):
        for rep in reps[body]:
            for k, v in rep["queries"].items():
                if v > 0:
                    dst.setdefault(k, []).append(v)
    common = sorted(k for k in qa if k in qb)
    ratios = {k: min(qb[k]) / min(qa[k]) for k in common}

    def med_or_none(xs, what):
        if not xs:
            print(f"[ab_analyze] no data for {what}; emitting null",
                  file=sys.stderr)
            return None
        return statistics.median(xs)

    med = med_or_none(list(ratios.values()), "overall ratio median")
    # paired per-rep medians: rep_i(r16)/rep_i(r15) — adjacent in time,
    # so shared drift cancels rep by rep
    paired = []
    for i in range(nreps):
        ra = reps["r15"][i]["queries"]
        rb = reps["r16"][i]["queries"]
        pm = med_or_none([rb[k] / ra[k] for k in common
                          if ra.get(k, 0) > 0 and rb.get(k, 0) > 0],
                         f"paired rep {i + 1}")
        paired.append(round(pm, 4) if pm is not None else None)
    multi = [k for k in common if min(qa[k]) >= 1.0]
    med_multi = med_or_none([ratios[k] for k in multi],
                            "multi-second median")
    srt = sorted(ratios.items(), key=lambda kv: kv[1])
    r16_only = sorted(set(qb) - set(qa))
    print(f"paired reps {nreps}, common {len(common)}, "
          f"min-over-reps median {med}, multi-second median {med_multi}, "
          f"paired {paired}")
    print("fastest:", srt[:5])
    print("slowest:", srt[-5:])
    r16sha = None
    for line in open(f"{OUT}/ab.log"):
        if "r16=" in line:
            r16sha = line.split("r16=")[1].split()[0]
            break
    out = {
        "bodies": {"r15": "ce545a4", "r16": r16sha},
        "paired_reps": nreps,
        "common": len(common),
        "min_over_reps_median": round(med, 4) if med is not None else None,
        "multi_second_median":
            round(med_multi, 4) if med_multi is not None else None,
        "paired_rep_medians": paired,
        "slowest": [[k, round(v, 3)] for k, v in srt[-8:]],
        "fastest": [[k, round(v, 3)] for k, v in srt[:8]],
        "r16_only_queries": r16_only,
    }
    with open("/root/repo/AB_r15_r16.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote /root/repo/AB_r15_r16.json")


if __name__ == "__main__":
    main()
