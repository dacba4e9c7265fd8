#!/bin/bash
# Paired A/B: round-15 final HEAD (ce545a4) vs round-16 HEAD ($1, the
# committed round-16 body), full Bench suite at sf0.1, alternating bodies
# per rep, direct java (no sbt in the timed window), both bodies from
# pinned worktrees compiled OUTSIDE the timed window.
#
# Why this artifact is load-bearing for round 16: the round's quiet
# canonical (BENCH_full.json) is sentinels-quiet WITHIN its run, but the
# box this session is measurably slower in absolute terms than the box
# that produced BENCH_early_r15.json (same-code back-to-back full suites
# read a per-query median of 1.47x vs r15-early while reading 1.01x vs
# each other — the whole session is uniformly slow, which within-run
# sentinels cannot see). Cross-round performance claims therefore rest on
# THIS same-session alternation, which cancels whatever drift both bodies
# share; the quiet canonical carries the per-query shapes, not the
# cross-round absolute.
#
# Usage: tools/ab_r15_r16.sh <r16-sha> [reps]   (default 3 paired reps)
set -u
R16SHA="${1:?usage: ab_r15_r16.sh <r16-sha> [reps]}"
NREPS="${2:-3}"
OUT=/root/repo/target/ab16
mkdir -p "$OUT"
SPARK_JARS=$(echo /opt/spark/jars/*.jar | tr ' ' ':')
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

setup_wt () { # $1=sha $2=dir
  if [ ! -f "$2/target/scala-2.13/classes/graft/Bench.class" ]; then
    git -C /root/repo worktree add -f "$2" "$1" || exit 1
    (cd "$2" && sbt -batch compile > "$2.compile.log" 2>&1) || exit 1
  fi
}
setup_wt ce545a4 "$OUT/r15wt"
setup_wt "$R16SHA" "$OUT/r16wt"

run_body () { # $1=classes-dir $2=workdir $3=outfile
  cd "$2" || exit 1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT="$3.artifact" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1:$SPARK_JARS" graft.Bench > "$3" 2> "$3.err"
  echo "rc=$? $(date +%H:%M:%S) $3 load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
}
R15C=$OUT/r15wt/target/scala-2.13/classes
R16C=$OUT/r16wt/target/scala-2.13/classes
echo "start r15-r16 $(date) r16=$R16SHA load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
# warmup rep (discarded): one run of each body to absorb page-cache fill
run_body "$R15C" "$OUT/r15wt" "$OUT/r15_warm.json"
run_body "$R16C" "$OUT/r16wt" "$OUT/r16_warm.json"
for rep in $(seq 1 "$NREPS"); do
  run_body "$R15C" "$OUT/r15wt" "$OUT/r15_rep$rep.json"
  run_body "$R16C" "$OUT/r16wt" "$OUT/r16_rep$rep.json"
done
echo "end r15-r16 $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
