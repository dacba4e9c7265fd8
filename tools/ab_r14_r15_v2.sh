#!/bin/bash
# Paired A/B: round-14 final HEAD (c33c2b9, worktree target/ab/r14wt) vs
# round-15 final HEAD (ce545a4, worktree target/ab/r15wt), full Bench suite
# at sf0.1, alternating bodies per rep, direct java (no sbt in the timed
# window). Round-16 revision of ab_r14_r15.sh: the original pointed the r15
# body at the live repo classes, which round 16 has since moved past — both
# bodies now come from pinned worktrees so the artifact adjudicates exactly
# the round-15 diff (incl. the final pHash routing commits 4e1def2/8e061b2
# that the quiet early canonical predates). Purpose: r15's end-of-round
# BENCH_full.json is drift-flagged by its own sentinels, so the r14-vs-r15
# comparison rests on same-session alternation, which cancels whatever
# drift both bodies share.
set -u
OUT=/root/repo/target/ab15v2
mkdir -p "$OUT"
SPARK_JARS=$(echo /opt/spark/jars/*.jar | tr ' ' ':')
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run_body () { # $1=classes-dir $2=workdir $3=outfile
  cd "$2" || exit 1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT="$3.artifact" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1:$SPARK_JARS" graft.Bench > "$3" 2> "$3.err"
  echo "rc=$? $(date +%H:%M:%S) $3 load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
}
R14C=/root/repo/target/ab/r14wt/target/scala-2.13/classes
R15C=/root/repo/target/ab/r15wt/target/scala-2.13/classes
R14D=/root/repo/target/ab/r14wt
R15D=/root/repo/target/ab/r15wt
echo "start r14-r15 v2 $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
# warmup rep (discarded): one run of each body to absorb page-cache fill
run_body "$R14C" "$R14D" "$OUT/r14_warm.json"
run_body "$R15C" "$R15D" "$OUT/r15_warm.json"
for rep in 1 2 3; do
  run_body "$R14C" "$R14D" "$OUT/r14_rep$rep.json"
  run_body "$R15C" "$R15D" "$OUT/r15_rep$rep.json"
done
echo "end r14-r15 v2 $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
