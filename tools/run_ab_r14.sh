#!/bin/bash
# Round-14 same-box A/B (r13 verdict task 3): the three rows that moved
# r12→r13 closing-to-closing, timed against all three code versions on one
# quiet box minutes apart, same corpus (/root/testdata/sf0.1):
#   - q_dedup_cluster_incr_prod  4.47 → 5.12 s  (+15%)
#   - q_composed_cdc             8.89 → 9.93 s  (+12%)
#   - flat incremental changes/s 5 985 → 5 257  (−12%)
# Versions: r12 fdb8e02 (/tmp/r12code), r13 3848715 (/tmp/r13code),
# r14 HEAD (/root/repo). The two query rows run via BENCH_ONLY (min of 3);
# the flat-incremental shape runs via ProfileCdc's bench1-3 "full process"
# cells (the 5000-change orders batch — the headline's exact shape, and the
# same harness code at every version).
set -euo pipefail
cd /root/repo

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=.scale
mkdir -p $OUT
ROWS="q_dedup_cluster_incr_prod,q_composed_cdc"

warm() { find "$1" -type f -exec cat {} + > /dev/null 2>&1 || true; }
cool() { echo "[ab] cool-down $1 s (load $(cut -d' ' -f1 /proc/loadavg))"; sleep "$1"; }

for v in r12:/tmp/r12code r13:/tmp/r13code r14:/root/repo; do
  name=${v%%:*}; wt=${v#*:}
  CP="/opt/spark/jars/*:$wt/target/scala-2.13/classes"
  cool 90; warm /root/testdata/sf0.1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$ROWS \
    SPARK_GRAFT_BENCH_OUT=$OUT/ab_${name}_rows.json \
    java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench > $OUT/ab_${name}_rows.stdout 2>&1
  echo "[ab] $name rows: $(cat $OUT/ab_${name}_rows.json)"
done

for v in r12:/tmp/r12code r13:/tmp/r13code r14:/root/repo; do
  name=${v%%:*}; wt=${v#*:}
  CP="/opt/spark/jars/*:$wt/target/scala-2.13/classes"
  cool 90; warm /root/testdata/sf0.1
  java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ProfileCdc /root/testdata/sf0.1 > $OUT/ab_${name}_profcdc.log 2>&1 || true
  grep -E "bench[0-9]" $OUT/ab_${name}_profcdc.log | sed "s/^/[ab] $name /" || true
done

echo "[ab] done"
