#!/bin/bash
# Round-16 interleaved same-box A/B: pre-round HEAD dc3d403 (/tmp/r16base)
# vs the optimized working tree (/root/repo), BENCH_ONLY min-of-3 per leg,
# legs base,after,base,after (element-wise min of the two legs per side —
# the repo's established per-change evidence protocol). Only compare WITHIN
# this A/B: BENCH_ONLY absolute numbers differ from full-bench context.
set -euo pipefail
cd /root/repo

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=.scale
mkdir -p $OUT
ROWS="${ROWS:-q_lifecycle,q_composed_build,q_composed_cdc,q_dedup_cluster_incr_prod,q_curation_pipeline,q_cdc_root,q_doc_flagship}"
TAG="${TAG:-ab16}"
COOL="${COOL:-60}"

warm() { find /root/testdata/sf0.1 -type f -exec cat {} + > /dev/null 2>&1 || true; }
run() { # $1 = side name, $2 = classes dir, $3 = leg number
  echo "[ab] cool-down $COOL s (load $(cut -d' ' -f1 /proc/loadavg))"; sleep "$COOL"; warm
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$ROWS \
    SPARK_GRAFT_BENCH_OUT=$OUT/${TAG}_$1$3.json \
    java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$2" graft.Bench > $OUT/${TAG}_$1$3.stdout 2>&1
  echo "[ab] $1 leg $3: $(cat $OUT/${TAG}_$1$3.json | head -c 300)"
}

run base  /tmp/r16base/target/scala-2.13/classes 1
run after /root/repo/target/scala-2.13/classes   1
run base  /tmp/r16base/target/scala-2.13/classes 2
run after /root/repo/target/scala-2.13/classes   2
echo "[ab] done"
