#!/bin/bash
# Round-15 scaling campaign. Changes over r14's protocol:
#   - sf1 drift ROOT-CAUSE experiment (r14 verdict task 3): FOUR sf1
#     full-set captures — a/b plain (the r14 dual-capture baseline, now with
#     per-query gc_ms attribution in the emission) and c/d with
#     SPARK_GRAFT_BENCH_SETTLE=1 (full GC + 200 ms pause before each query).
#     If settling collapses the a/b drift, the drift is JVM heap/GC
#     accumulation across the 113-query sequence and the settle knob
#     replaces the dual-capture protocol; gc_ms tells per-row which wall
#     times moved with collector time either way.
#   - RecallScale on the bounded-dup corpora (r14 verdict task 4): ANN
#     recall@50 at the shipped refine=0 vs refine=2 vs full-probe, the
#     numbers behind the seed-default decision. MutationScale emits the
#     same cell at sf0.1/sf1.
#   - closing bench emits value (full timed set) AND value_common (stable
#     per-query set) so cross-round totals read without recomputation.
# Protocol otherwise r14's: -Xmx32g, cool-downs, page-cache pre-warm,
# pinned sf1 corpus with provenance hashes verified before cross-round reads.
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

# ---- 1. corpora (untimed; sf1 + bdup are PINNED from r13/r14) ---------------
if [ ! -d $OUT/sf1/documents.parquet ]; then
  $RUN graft.tools.ScaleUp /root/testdata/sf0.1 $OUT/sf1 10 2>&1 | grep -v WARN || true
fi
if [ ! -d $OUT/bdup5k/documents.parquet ]; then
  $RUN graft.tools.BoundedDup $OUT/bdup5k 5000 12 2>&1 | grep -v WARN || true
fi
if [ ! -d $OUT/bdup50k/documents.parquet ]; then
  $RUN graft.tools.BoundedDup $OUT/bdup50k 50000 12 2>&1 | grep -v WARN || true
fi

# ---- 2. row counts + provenance (untimed; hashes must match r14's before
#         any cross-round sf1 read) ------------------------------------------
$RUN graft.tools.CountRows /root/testdata/sf0.1 $SUPERLINEAR > $OUT/cnt01.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/sf1 $SUPERLINEAR > $OUT/cnt1.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/bdup5k $BDUPQ > $OUT/cntb01.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/bdup50k $BDUPQ > $OUT/cntb1.log 2>/dev/null
python3 tools/sf1_provenance.py $OUT/sf1 $OUT/sf1_provenance_r15.json

# ---- 3. bounded-dup benches + recall cells ----------------------------------
cool 120; warm $OUT/bdup5k
SPARK_GRAFT_SF_DIR=$OUT/bdup5k SPARK_GRAFT_BENCH_ONLY=$BDUPQ SPARK_GRAFT_BENCH_OUT=$OUT/bdup01.json \
  $RUN graft.Bench > $OUT/bdup01.stdout 2>&1
cool 120; warm $OUT/bdup50k
SPARK_GRAFT_SF_DIR=$OUT/bdup50k SPARK_GRAFT_BENCH_ONLY=$BDUPQ SPARK_GRAFT_BENCH_OUT=$OUT/bdup1.json \
  $RUN graft.Bench > $OUT/bdup1.stdout 2>&1
cool 60
$RUN graft.tools.RecallScale $OUT/bdup5k $OUT/recall_bdup5k.json > /dev/null 2>&1
$RUN graft.tools.RecallScale $OUT/bdup50k $OUT/recall_bdup50k.json > /dev/null 2>&1

# ---- 4. mutation paths (now incl. the recall@50 cell) -----------------------
cool 120
$RUN graft.tools.MutationScale /root/testdata/sf0.1 $OUT/mut01.json > $OUT/mut01.stdout 2>&1
cool 120
$RUN graft.tools.MutationScale $OUT/sf1 $OUT/mut1.json > $OUT/mut1.stdout 2>&1

# ---- 5. composed-pipeline stage profile -------------------------------------
cool 120; warm /root/testdata/sf0.1
$RUN graft.tools.ComposedProfile /root/testdata/sf0.1 $OUT/comp01.json > $OUT/comp01.stdout 2>&1
cool 120; warm $OUT/sf1
$RUN graft.tools.ComposedProfile $OUT/sf1 $OUT/comp1.json > $OUT/comp1.stdout 2>&1

# ---- 6. partitioned-layout incremental A/B at both scales -------------------
cool 120; warm /root/testdata/sf0.1
$RUN graft.tools.ProfileCdc /root/testdata/sf0.1 > $OUT/profcdc01.log 2>&1
cool 120; warm $OUT/sf1
$RUN graft.tools.ProfileCdc $OUT/sf1 > $OUT/profcdc1.log 2>&1

# ---- 7. full-set benches: sf0.1 closing + the sf1 drift experiment ----------
cool 180; warm /root/testdata/sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_closing_r15.json \
  $RUN graft.Bench > $OUT/bench_closing_r15.stdout 2>&1
# sf1 a/b: the r14 dual-capture baseline, now with gc_ms attribution
cool 180; warm $OUT/sf1
SPARK_GRAFT_SF_DIR=$OUT/sf1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf1_a.json \
  $RUN graft.Bench > $OUT/bench_sf1_a.stdout 2>&1
cool 180; warm $OUT/sf1
SPARK_GRAFT_SF_DIR=$OUT/sf1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf1_b.json \
  $RUN graft.Bench > $OUT/bench_sf1_b.stdout 2>&1
# sf1 c/d: the settle hypothesis — full GC + pause before each query
cool 180; warm $OUT/sf1
SPARK_GRAFT_SF_DIR=$OUT/sf1 SPARK_GRAFT_BENCH_SETTLE=1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf1_c.json \
  $RUN graft.Bench > $OUT/bench_sf1_c.stdout 2>&1
cool 180; warm $OUT/sf1
SPARK_GRAFT_SF_DIR=$OUT/sf1 SPARK_GRAFT_BENCH_SETTLE=1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf1_d.json \
  $RUN graft.Bench > $OUT/bench_sf1_d.stdout 2>&1

echo "[campaign] done"
