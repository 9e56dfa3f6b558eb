#!/bin/bash
set -euo pipefail
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
ROWS="q_lifecycle,q_composed_build,q_dedup_cluster_incr_prod,q_curation_pipeline,q_doc_flagship"
run() {
  echo "[ab-sf1] cool 60 (load $(cut -d' ' -f1 /proc/loadavg))"; sleep 60
  SPARK_GRAFT_SF_DIR=.scale/sf1 SPARK_GRAFT_BENCH_ONLY=$ROWS SPARK_GRAFT_BENCH_OUT=.scale/ab16sf1_$1$2.json \
    java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:$3" graft.Bench > .scale/ab16sf1_$1$2.stdout 2>&1
  echo "[ab-sf1] $1$2: $(head -c 250 .scale/ab16sf1_$1$2.json)"
}
run base  1 /tmp/r16base/target/scala-2.13/classes
run after 1 /root/repo/target/scala-2.13/classes
run base  2 /tmp/r16base/target/scala-2.13/classes
run after 2 /root/repo/target/scala-2.13/classes
echo "[ab-sf1] done"
