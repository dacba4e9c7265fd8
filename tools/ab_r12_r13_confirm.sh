#!/bin/bash
# Confirm pass for the r12-vs-r13 adjudication with SCHEME-IDENTICAL
# bodies: the first A/B's r13 body ran the (since-reverted) A/A trial
# scheme, which inflates per-query mins ~1.2x by construction. This
# rerun uses the reverted back-to-back Bench on both sides — the
# number that stands for "round-13 code vs round-12 code".
set -u
OUT=/root/repo/target/ab
SPARK_JARS=$(echo /opt/spark/jars/*.jar | tr ' ' ':')
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run_body () {
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
echo "start r12-r13 CONFIRM (scheme-identical) $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
for rep in 1 2; do
  run_body "$R12C" "/root/repo/target/ab/r12wt" "$OUT/r12c_rep$rep.json"
  run_body "$R13C" "/root/repo" "$OUT/r13c_rep$rep.json"
done
echo "end confirm $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
