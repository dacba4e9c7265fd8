#!/bin/bash
# Paired A/B: round-11 canonical-bench commit (ff0db73, the previous
# committed BENCH_full.json) vs round-11 end HEAD, full Bench suite at
# sf0.1, alternating bodies per rep, direct java (no sbt in the timed
# window). Purpose: the two HEAD bench runs of 2026-08-15 read the
# 248-query common set a uniform ~1.18x above the committed artifact
# even though git shows those query bodies byte-identical — this A/B
# separates box drift from a code delta, per BASELINE.md §adjudication.
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
R10C=/root/repo/target/ab/r10wt/target/scala-2.13/classes
R11C=/root/repo/target/scala-2.13/classes
R10D=/root/repo/target/ab/r10wt
R11D=/root/repo
echo "start $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
# warmup rep (discarded): one run of each body to absorb page-cache fill
run_body "$R10C" "$R10D" "$OUT/r10_warm.json"
run_body "$R11C" "$R11D" "$OUT/r11_warm.json"
for rep in 1 2 3; do
  run_body "$R10C" "$R10D" "$OUT/r10_rep$rep.json"
  run_body "$R11C" "$R11D" "$OUT/r11_rep$rep.json"
done
echo "done $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
