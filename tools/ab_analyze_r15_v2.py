#!/usr/bin/env python3
"""Analyze the r14-vs-r15 alternating A/B (target/ab15v2/{r14,r15}_rep*, both bodies pinned worktrees — see tools/ab_r14_r15_v2.sh)
and write AB_r14_r15.json — the number that stands for round-15 code vs round-14 code, used because round 14 shipped no sentinels-quiet canonical (the alternation
cancels the drift both bodies share); round 15's quiet canonicals carry
the absolute numbers."""
import json
import statistics

OUT = "/root/repo/target/ab15v2"
REPS = (1, 2, 3)


def load(path):
    for line in reversed(open(path).read().strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main():
    reps = {b: [load(f"{OUT}/{b}_rep{i}.json") for i in REPS]
            for b in ("r14", "r15")}
    qa, qb = {}, {}
    for body, dst in (("r14", qa), ("r15", qb)):
        for rep in reps[body]:
            for k, v in rep["queries"].items():
                if v > 0:
                    dst.setdefault(k, []).append(v)
    common = sorted(k for k in qa if k in qb)
    ratios = {k: min(qb[k]) / min(qa[k]) for k in common}
    # ADVICE r14: statistics.median raises StatisticsError on empty
    # input — guard and emit null with a stderr note instead.
    import sys

    def med_or_none(xs, what):
        if not xs:
            print(f"[ab_analyze] no data for {what}; emitting null",
                  file=sys.stderr)
            return None
        return statistics.median(xs)

    med = med_or_none(list(ratios.values()), "overall ratio median")
    # paired per-rep medians: rep_i(r15)/rep_i(r14) — adjacent in time,
    # so shared drift cancels rep by rep
    paired = []
    for i in range(len(REPS)):
        ra = reps["r14"][i]["queries"]
        rb = reps["r15"][i]["queries"]
        pm = med_or_none([rb[k] / ra[k] for k in common
                          if ra.get(k, 0) > 0 and rb.get(k, 0) > 0],
                         f"paired rep {i + 1}")
        paired.append(round(pm, 4) if pm is not None else None)
    multi = [k for k in common if min(qa[k]) >= 1.0]
    med_multi = med_or_none([ratios[k] for k in multi],
                            "multi-second median")
    srt = sorted(ratios.items(), key=lambda kv: kv[1])
    print(f"common {len(common)}, min-over-3 median {med}, "
          f"multi-second median {med_multi}, paired {paired}")
    print("fastest:", srt[:5])
    print("slowest:", srt[-5:])
    out = {
        "bodies": {"r14": "c33c2b9", "r15": "ce545a4"},
        "common": len(common),
        "min_over_reps_median": round(med, 4) if med is not None else None,
        "multi_second_median":
            round(med_multi, 4) if med_multi is not None else None,
        "paired_rep_medians": paired,
        "slowest": [[k, round(v, 3)] for k, v in srt[-8:]],
        "fastest": [[k, round(v, 3)] for k, v in srt[:8]],
    }
    with open("/root/repo/AB_r14_r15.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote /root/repo/AB_r14_r15.json")


if __name__ == "__main__":
    main()
