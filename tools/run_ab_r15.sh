#!/bin/bash
# Round-15 same-box A/B (r14 verdict task 2): the six closing rows that
# moved r13→r14 quiet-to-quiet WITHOUT an adjudicating A/B:
#   - q_cdc_root                2.96 → 3.87 s  (+31%)  <- runs through r14's
#                                                         most-edited file
#   - q_dedup_minhash_incr_prod 0.97 → 1.30 s  (+34%)
#   - q_dedup_simhash_prod      0.88 → 1.17 s  (+32%)
#   - q_ann_ivfpq               1.82 → 2.23 s  (+23%)
#   - q_ann_quantized           1.27 → 1.55 s  (+22%)
#   - q_ann_ivfpq_residual      1.33 → 1.62 s  (+22%)
# Versions: r13 1ab1231 (/tmp/r13code), r14 c155e6b (/tmp/r14code),
# r15 HEAD (/root/repo), same corpus (/root/testdata/sf0.1), BENCH_ONLY
# (min of 3), 90 s cool-downs. Only compare WITHIN this A/B — BENCH_ONLY
# absolute numbers differ from full-bench context (less JIT warmth).
set -euo pipefail
cd /root/repo

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=.scale
mkdir -p $OUT
ROWS="q_cdc_root,q_dedup_minhash_incr_prod,q_dedup_simhash_prod,q_ann_ivfpq,q_ann_quantized,q_ann_ivfpq_residual"

warm() { find "$1" -type f -exec cat {} + > /dev/null 2>&1 || true; }
cool() { echo "[ab] cool-down $1 s (load $(cut -d' ' -f1 /proc/loadavg))"; sleep "$1"; }

for v in r13:/tmp/r13code r14:/tmp/r14code r15:/root/repo; do
  name=${v%%:*}; wt=${v#*:}
  CP="/opt/spark/jars/*:$wt/target/scala-2.13/classes"
  cool 90; warm /root/testdata/sf0.1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ONLY=$ROWS \
    SPARK_GRAFT_BENCH_OUT=$OUT/ab15_${name}_rows.json \
    java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench > $OUT/ab15_${name}_rows.stdout 2>&1
  echo "[ab] $name rows: $(cat $OUT/ab15_${name}_rows.json)"
done

echo "[ab] done"
