#!/bin/bash
# Round-12 scaling campaign: every input finalize_scaling_r12.py needs,
# measured QUIET at HEAD. Round-12 additions over r11's protocol:
#   - ComposedProfile at BOTH scales (the composed steady-state legs —
#     incl. the now-default impact-capped BM25 probe leg — diffed at 10x
#     corpus, the r11 verdict's "composed probe flat at 10x" evidence)
#   - MutationScale now emits cluster.apply_stages (shingle / probe /
#     candidates / verify / merge / append attribution at both scales)
#
# Protocol (ARCHITECTURE.md "Heap sizing" + "load self-labeling"):
#   -Xmx32g bounded heap, cool-downs between timed runs (1-min loadavg is
#   backward-looking), page-cache pre-warm of the input dir before each
#   timed bench so run 1 of 3 pays no cold reads.
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

# ---- 1. corpora (untimed; reused if present — ScaleUp/BoundedDup are
#         deterministic, so the r11-generated dirs are byte-stable) ----------
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

# ---- 4. mutation paths (now with cluster apply_stages attribution) ---------
cool 120
$RUN graft.tools.MutationScale /root/testdata/sf0.1 $OUT/mut01.json > $OUT/mut01.stdout 2>&1
cool 120
$RUN graft.tools.MutationScale $OUT/sf1 $OUT/mut1.json > $OUT/mut1.stdout 2>&1

# ---- 5. composed-pipeline stage profile at both scales (NEW in r12) --------
cool 120; warm /root/testdata/sf0.1
$RUN graft.tools.ComposedProfile /root/testdata/sf0.1 $OUT/comp01.json > $OUT/comp01.stdout 2>&1
cool 120; warm $OUT/sf1
$RUN graft.tools.ComposedProfile $OUT/sf1 $OUT/comp1.json > $OUT/comp1.stdout 2>&1

# ---- 6. full-set benches (the curve itself) --------------------------------
cool 180; warm /root/testdata/sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf01.json \
  $RUN graft.Bench > $OUT/bench_sf01.stdout 2>&1
cool 180; warm $OUT/sf1
SPARK_GRAFT_SF_DIR=$OUT/sf1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf1.json \
  $RUN graft.Bench > $OUT/bench_sf1.stdout 2>&1

echo "[campaign] done"
