#!/bin/bash
set -euo pipefail
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
CP="/opt/spark/jars/*:/root/repo/target/scala-2.13/classes"
warm() { find "$1" -type f -exec cat {} + > /dev/null 2>&1 || true; }
cap() { # $1=out $2=sfdir $3=cpus
  echo "[closing] cool-down 90 s (load $(cut -d' ' -f1 /proc/loadavg))"; sleep 90; warm "$2"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_CPUS="$3" SPARK_GRAFT_BENCH_OUT=".scale/$1" \
    java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench > ".scale/$1.stdout" 2>&1
  echo "[closing] $1 done: $(python3 -c "import json;d=json.load(open('.scale/$1'));print(d['value'],d['value_common'],d['snapshot_docs_per_sec'])")"
}
cap closing_r16_a.json /root/testdata/sf0.1 32
cap closing_r16_b.json /root/testdata/sf0.1 32
cap sf1_r16_32a.json .scale/sf1 32
cap sf1_r16_32b.json .scale/sf1 32
cap sf1_r16_8a.json .scale/sf1 8
cap sf1_r16_8b.json .scale/sf1 8
echo "[closing] all done"
