#!/usr/bin/env python3
"""Analyze the scheme-identical confirm A/B (r12c/r13c reps) and fold
the result into AB_r12_r13.json as the `confirm` section — the number
that stands for round-13 code vs round-12 code after the A/A trial
scheme was reverted (both bodies back-to-back mins)."""
import json
import statistics

OUT = "/root/repo/target/ab"


def load(path):
    for line in reversed(open(path).read().strip().splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main():
    reps = {b: [load(f"{OUT}/{b}_rep{i}.json") for i in (1, 2)]
            for b in ("r12c", "r13c")}
    qa, qb = {}, {}
    for body, dst in (("r12c", qa), ("r13c", qb)):
        for rep in reps[body]:
            for k, v in rep["queries"].items():
                if v > 0:
                    dst.setdefault(k, []).append(v)
    common = sorted(k for k in qa if k in qb)
    ratios = {k: min(qb[k]) / min(qa[k]) for k in common}
    med = statistics.median(ratios.values())
    paired = []
    for i in range(2):
        ra = reps["r12c"][i]["queries"]
        rb = reps["r13c"][i]["queries"]
        paired.append(round(statistics.median(
            [rb[k] / ra[k] for k in common
             if ra.get(k, 0) > 0 and rb.get(k, 0) > 0]), 4))
    srt = sorted(ratios.items(), key=lambda kv: kv[1])
    print(f"confirm: common {len(common)}, min-over-2 median {med:.3f}, "
          f"paired {paired}")
    print(" worst:", [(k, round(r, 2)) for k, r in srt[-5:]])
    sent = [r.get("sentinels") for r in reps["r13c"]]
    summary = json.load(open("/root/repo/AB_r12_r13.json"))
    summary["confirm"] = {
        "note": "scheme-identical rerun (both bodies back-to-back "
                "mins, reverted Bench): the standing code-delta number",
        "common_n": len(common),
        "median_min_ratio": round(med, 4),
        "paired_medians": paired,
        "totals": {b: [r.get("value") for r in reps[b]]
                   for b in ("r12c", "r13c")},
        "loads": {b: [r.get("load_before") for r in reps[b]]
                  for b in ("r12c", "r13c")},
        "r13_sentinels": sent,
        "worst": srt[-8:],
        "best": srt[:8],
    }
    with open("/root/repo/AB_r12_r13.json", "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print("updated /root/repo/AB_r12_r13.json")


if __name__ == "__main__":
    main()
