#!/bin/bash
# Post-capture code-equivalence A/B: the review fixes (commit 1318ff6)
# landed AFTER the round-15 closing captures and touch IncrementalEngine's
# derivation/validation code. The claim is that every BENCHED path executes
# the identical plan (the fixes only change fallback and construction-time
# validation). Adjudicate it the established way: interleaved same-box
# BENCH_ONLY over the engine's benched CDC rows, campaign HEAD 9ffbb66
# (/tmp/r15campaign) vs final HEAD (/root/repo), two rounds each
# (A-B-A-B), min per row per side. Only compare WITHIN this A/B.
set -euo pipefail
cd /root/repo

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=.scale
mkdir -p $OUT
ROWS="q_cdc_root,q_cdc_child,q_cdc_partitioned,q_cdc_through_partitioned"

cool() { echo "[ab] cool-down $1 s (load $(cut -d' ' -f1 /proc/loadavg))"; sleep "$1"; }

find /root/testdata/sf0.1 -type f -exec cat {} + > /dev/null 2>&1 || true
for round in 1 2; do
  for v in campaign:/tmp/r15campaign final:/root/repo; do
    name=${v%%:*}; wt=${v#*:}
    CP="/opt/spark/jars/*:$wt/target/scala-2.13/classes"
    cool 60
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$ROWS \
      SPARK_GRAFT_BENCH_OUT=$OUT/ab15pf_${name}_${round}.json \
      java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Bench > $OUT/ab15pf_${name}_${round}.stdout 2>&1
    echo "[ab] $name/$round: $(cat $OUT/ab15pf_${name}_${round}.json)"
  done
done
echo "[ab] done"
