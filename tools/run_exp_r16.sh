#!/bin/bash
set -euo pipefail
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() { # $1=tag $2=rows $3=extra-env-name $4=extra-env-val
  sleep 45
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$2 \
    SPARK_GRAFT_BENCH_OUT=.scale/$1.json ${3:+$3=$4} \
    java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes" graft.Bench > .scale/$1.stdout 2>&1
  echo "[exp] $1: $(head -c 200 .scale/$1.json)"
}
run exp16_bloom_off1 q_cdc_root
run exp16_bloom_on1  q_cdc_root GRAFT_EXP_BLOOM 1
run exp16_bloom_off2 q_cdc_root
run exp16_bloom_on2  q_cdc_root GRAFT_EXP_BLOOM 1
run exp16_mad_on1  q_composed_cdc
run exp16_mad_off1 q_composed_cdc GRAFT_EXP_DISKONLY 1
run exp16_mad_on2  q_composed_cdc
run exp16_mad_off2 q_composed_cdc GRAFT_EXP_DISKONLY 1
echo "[exp] done"
