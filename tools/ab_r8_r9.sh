#!/bin/bash
# Paired A/B: r8 end commit (90298c2) vs r9 end commit (HEAD=3800ade),
# full Bench suite at sf0.1, alternating bodies per rep, direct java
# (no sbt in the timed window). Protocol: BASELINE.md §adjudication.
set -u
OUT=/root/repo/target/ab
mkdir -p "$OUT"
SPARK_JARS=$(echo /opt/spark/jars/*.jar | tr ' ' ':')
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run_body () { # $1=classes-dir $2=workdir $3=outfile
  cd "$2" || exit 1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1:$SPARK_JARS" graft.Bench > "$3" 2> "$3.err"
  echo "rc=$? $(date +%H:%M:%S) $3" >> "$OUT/ab.log"
}
R8C=/root/repo/target/ab/r8wt/target/scala-2.13/classes
R9C=/root/repo/target/scala-2.13/classes
R8D=/root/repo/target/ab/r8wt
R9D=/root/repo
echo "start $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
# warmup rep (discarded): one run of each body to absorb page-cache fill
run_body "$R8C" "$R8D" "$OUT/r8_warm.json"
run_body "$R9C" "$R9D" "$OUT/r9_warm.json"
for rep in 1 2 3; do
  run_body "$R8C" "$R8D" "$OUT/r8_rep$rep.json"
  run_body "$R9C" "$R9D" "$OUT/r9_rep$rep.json"
done
echo "done $(date) load=$(cat /proc/loadavg)" >> "$OUT/ab.log"
