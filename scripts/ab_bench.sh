#!/bin/bash
# Same-box interleaved A/B bench between two builds (e.g. two git
# snapshots compiled into separate classes dirs). Runs graft.Bench on the
# named queries ROUNDS times per side, strictly alternating A,B,A,B,...
# so box drift (thermal/cache/background load) hits both sides equally —
# the methodology the round-11 verdict asked for to adjudicate the +8.7%
# r10->r11 drift. Each Bench invocation is itself best-of-2 per query;
# report the per-query MIN across rounds per side.
#
# Usage: scripts/ab_bench.sh <classesA> <classesB> <sfDir> <rounds> <query...>
set -e
cd "$(dirname "$0")/.."
CA=$1; CB=$2; SF=$3; ROUNDS=$4; shift 4
QUERIES=("$@")
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() { # $1 = side label, $2 = classes dir
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  java $OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$2":"/opt/spark/jars/*" graft.Bench "${QUERIES[@]}" 2>/dev/null \
    | sed "s/^/[$1] /"
}
for r in $(seq 1 "$ROUNDS"); do
  echo "== round $r side A =="; run A "$CA"
  echo "== round $r side B =="; run B "$CB"
done
