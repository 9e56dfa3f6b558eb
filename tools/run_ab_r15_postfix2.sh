#!/bin/bash
# Post-fix code-equivalence A/B, part 2: the PRUNED engine path (the code
# most edited by commit 1318ff6's affectedPartVals restructure) via the
# ProfileCdc instrument, interleaved campaign-HEAD/final-HEAD, two rounds.
set -euo pipefail
cd /root/repo
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=.scale
for round in 1 2; do
  for v in campaign:/tmp/r15campaign final:/root/repo; do
    name=${v%%:*}; wt=${v#*:}
    CP="/opt/spark/jars/*:$wt/target/scala-2.13/classes"
    echo "[ab2] cool-down 60 s (load $(cut -d' ' -f1 /proc/loadavg))"; sleep 60
    java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.tools.ProfileCdc /root/testdata/sf0.1 \
      > $OUT/ab15pf2_${name}_${round}.log 2>&1 || true
    echo "[ab2] $name/$round done"
  done
done
echo "[ab2] done"
