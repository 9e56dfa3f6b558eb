#!/bin/bash
# Round-11 scaling campaign: produce every input finalize_scaling_r11.py
# needs, measured QUIET at HEAD (the r10 verdict task #8: the committed
# curve must match the closing snapshot, include the media pipelines, and
# decompose the pair-producing dedup rows on a bounded-dup-rate corpus).
#
# Protocol (ARCHITECTURE.md "Heap sizing" + "load self-labeling"):
#   -Xmx32g bounded heap, ~3 min cool-down between timed runs (1-min
#   loadavg is backward-looking), page-cache pre-warm of the input dir
#   before each timed bench so run 1 of 3 pays no cold reads.
set -euo pipefail
cd /root/repo

CP="/opt/spark/jars/*:target/scala-2.13/classes"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
RUN="java -Xmx32g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
OUT=.scale
mkdir -p $OUT

warm() { find "$1" -type f -exec cat {} + > /dev/null 2>&1 || true; }
cool() { echo "[campaign] cool-down $1 s (load $(cut -d' ' -f1 /proc/loadavg))"; sleep "$1"; }

SUPERLINEAR="q_dedup_simhash_prod,q_dedup_ngram,q_dedup_minhash_prod,q_dedup_embed_lsh,q_dedup_semantic,q_decontaminate,q_decontaminate_bloom,q_dedup_span_ranges,q_dsir"
BDUPQ="q_dedup_ngram,q_dedup_minhash_prod,q_dedup_simhash_prod,q_dedup_span_ranges,q_dedup_embed_lsh,q_dedup_semantic"

# ---- 1. corpora (untimed) --------------------------------------------------
if [ ! -d $OUT/sf1/documents.parquet ]; then
  $RUN graft.tools.ScaleUp /root/testdata/sf0.1 $OUT/sf1 10 2>&1 | grep -v WARN || true
fi
if [ ! -d $OUT/bdup5k/documents.parquet ]; then
  $RUN graft.tools.BoundedDup $OUT/bdup5k 5000 12 2>&1 | grep -v WARN || true
fi
if [ ! -d $OUT/bdup50k/documents.parquet ]; then
  $RUN graft.tools.BoundedDup $OUT/bdup50k 50000 12 2>&1 | grep -v WARN || true
fi

# ---- 2. row counts (untimed; separate answer growth from compute) ----------
$RUN graft.tools.CountRows /root/testdata/sf0.1 $SUPERLINEAR > $OUT/cnt01.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/sf1 $SUPERLINEAR > $OUT/cnt1.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/bdup5k $BDUPQ > $OUT/cntb01.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/bdup50k $BDUPQ > $OUT/cntb1.log 2>/dev/null

# ---- 3. bounded-dup benches (short) ----------------------------------------
cool 120; warm $OUT/bdup5k
SPARK_GRAFT_SF_DIR=$OUT/bdup5k SPARK_GRAFT_BENCH_ONLY=$BDUPQ SPARK_GRAFT_BENCH_OUT=$OUT/bdup01.json \
  $RUN graft.Bench > $OUT/bdup01.stdout 2>&1
cool 120; warm $OUT/bdup50k
SPARK_GRAFT_SF_DIR=$OUT/bdup50k SPARK_GRAFT_BENCH_ONLY=$BDUPQ SPARK_GRAFT_BENCH_OUT=$OUT/bdup1.json \
  $RUN graft.Bench > $OUT/bdup1.stdout 2>&1

# ---- 4. mutation paths ------------------------------------------------------
cool 120
$RUN graft.tools.MutationScale /root/testdata/sf0.1 $OUT/mut01.json > $OUT/mut01.stdout 2>&1
cool 120
$RUN graft.tools.MutationScale $OUT/sf1 $OUT/mut1.json > $OUT/mut1.stdout 2>&1

# ---- 5. full-set benches (the curve itself) --------------------------------
cool 180; warm /root/testdata/sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf01.json \
  $RUN graft.Bench > $OUT/bench_sf01.stdout 2>&1
cool 180; warm $OUT/sf1
SPARK_GRAFT_SF_DIR=$OUT/sf1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf1.json \
  $RUN graft.Bench > $OUT/bench_sf1.stdout 2>&1

echo "[campaign] done"
