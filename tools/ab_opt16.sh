#!/bin/bash
# Round-16 OPTIMIZATION A/B: session-start HEAD (1fafd14, the inherited
# round-16 build body) vs the optimized body, full Bench suite at
# sf0.1/32 cpus, alternating arms per rep, direct java — the same
# same-session-alternation protocol as tools/ab_r15_r16.sh (BASELINE.md
# standing policy: cross-code absolutes only from alternation).
# Usage: tools/ab_opt16.sh [reps]   (default 2; startwt must exist,
# compiled, at target/opt16/startwt)
set -u
NREPS="${1:-2}"
OUT=/root/repo/target/opt16/ab
mkdir -p "$OUT"
run () { # $1=classes $2=out
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    /root/repo/tools/bench_once.sh "$2" "$1" >> "$OUT/ab.log" 2>&1
}
echo "start opt16 ab $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
for rep in $(seq 1 "$NREPS"); do
  run /root/repo/target/opt16/startwt/target/scala-2.13/classes "$OUT/old_rep$rep.json"
  run /root/repo/target/scala-2.13/classes "$OUT/new_rep$rep.json"
done
echo "end opt16 ab $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
