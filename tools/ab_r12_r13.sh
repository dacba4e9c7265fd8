#!/bin/bash
# Paired A/B: round-12 final HEAD (9fdba31, the previous committed
# BENCH_full.json body) vs round-13 HEAD, full Bench suite at sf0.1,
# alternating bodies per rep, direct java (no sbt in the timed window).
# Purpose: the round-13 canonical read the common set a median 1.40x
# above 9fdba31's artifact, UNIFORMLY (sub-second median 1.47, multi-
# second 1.29) — the cross-day box-drift signature BASELINE.md
# §adjudication documents (round 11 measured 1.18x on byte-identical
# code; round 12's 1.47x adjudicated to 1.024). Same-session
# alternation separates box drift from a code delta.
set -u
OUT=/root/repo/target/ab
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
  echo "rc=$? $(date +%H:%M:%S) $3" >> "$OUT/ab.log"
}
R12C=/root/repo/target/ab/r12wt/target/scala-2.13/classes
R13C=/root/repo/target/scala-2.13/classes
R12D=/root/repo/target/ab/r12wt
R13D=/root/repo
echo "start r12-r13 $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
# warmup rep (discarded): one run of each body to absorb page-cache fill
run_body "$R12C" "$R12D" "$OUT/r12b_warm.json"
run_body "$R13C" "$R13D" "$OUT/r13_warm.json"
for rep in 1 2 3; do
  run_body "$R12C" "$R12D" "$OUT/r12b_rep$rep.json"
  run_body "$R13C" "$R13D" "$OUT/r13_rep$rep.json"
done
echo "end r12-r13 $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
