#!/bin/bash
# Paired A/B: round-11 final HEAD (7b66864, the previous committed
# BENCH_full.json body) vs round-12 HEAD, full Bench suite at sf0.1,
# alternating bodies per rep, direct java (no sbt in the timed window).
# Purpose: the round-12 quiet-box canonical (load_before 1.04) read the
# common set a median 1.28x above 7b66864's artifact and 1.47x above
# ff0db73's, concentrated in sub-second metadata/IO-bound queries
# (catalog_*, compact_small_files, csv roundtrip) while multi-second
# queries are ~flat — the cross-day box-drift signature BASELINE.md
# §adjudication documents. This A/B separates box drift from a code
# delta the same way rounds 10→11 were adjudicated.
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
R11C=/root/repo/target/ab/r11wt/target/scala-2.13/classes
R12C=/root/repo/target/scala-2.13/classes
R11D=/root/repo/target/ab/r11wt
R12D=/root/repo
echo "start r11-r12 $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
# warmup rep (discarded): one run of each body to absorb page-cache fill
run_body "$R11C" "$R11D" "$OUT/r11h_warm.json"
run_body "$R12C" "$R12D" "$OUT/r12_warm.json"
for rep in 1 2 3; do
  run_body "$R11C" "$R11D" "$OUT/r11h_rep$rep.json"
  run_body "$R12C" "$R12D" "$OUT/r12_rep$rep.json"
done
echo "end r11-r12 $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
