#!/bin/bash
# Round-14 scaling campaign: every input finalize_scaling_r14.py needs,
# measured QUIET at HEAD. Round-13 additions over r12's protocol:
#   - ProfileCdc at BOTH scales (profcdc01/1.log): the four-cell
#     flat/partitioned incremental A/B — the layout answer to the
#     scan-bounded incremental floor, the round's lead task
#   - Bench now emits incremental_changes_per_sec_partitioned at both
#     scales (key-clustered batch, one-time layout prep amortized)
#   - MutationScale now emits the impact-growth DEFAULT excursion
#     (growth_appends64 / probe_pruned_excursion64 / growth_compact /
#     probe_pruned_post_growth) and ComposedProfile the nested
#     cluster seed+apply merge/* decomposition
#   - sf1 corpus provenance hashes (tools/sf1_provenance.py) recorded
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
#         deterministic; the r13 sf1 corpus is PINNED this round and its
#         content hashes recorded in sf1_provenance) -------------------------
if [ ! -d $OUT/sf1/documents.parquet ]; then
  $RUN graft.tools.ScaleUp /root/testdata/sf0.1 $OUT/sf1 10 2>&1 | grep -v WARN || true
fi
if [ ! -d $OUT/bdup5k/documents.parquet ]; then
  $RUN graft.tools.BoundedDup $OUT/bdup5k 5000 12 2>&1 | grep -v WARN || true
fi
if [ ! -d $OUT/bdup50k/documents.parquet ]; then
  $RUN graft.tools.BoundedDup $OUT/bdup50k 50000 12 2>&1 | grep -v WARN || true
fi

# ---- 2. row counts + provenance (untimed) ----------------------------------
$RUN graft.tools.CountRows /root/testdata/sf0.1 $SUPERLINEAR > $OUT/cnt01.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/sf1 $SUPERLINEAR > $OUT/cnt1.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/bdup5k $BDUPQ > $OUT/cntb01.log 2>/dev/null
$RUN graft.tools.CountRows $OUT/bdup50k $BDUPQ > $OUT/cntb1.log 2>/dev/null
python3 tools/sf1_provenance.py $OUT/sf1 $OUT/sf1_provenance.json

# ---- 3. bounded-dup benches (short) ----------------------------------------
cool 120; warm $OUT/bdup5k
SPARK_GRAFT_SF_DIR=$OUT/bdup5k SPARK_GRAFT_BENCH_ONLY=$BDUPQ SPARK_GRAFT_BENCH_OUT=$OUT/bdup01.json \
  $RUN graft.Bench > $OUT/bdup01.stdout 2>&1
cool 120; warm $OUT/bdup50k
SPARK_GRAFT_SF_DIR=$OUT/bdup50k SPARK_GRAFT_BENCH_ONLY=$BDUPQ SPARK_GRAFT_BENCH_OUT=$OUT/bdup1.json \
  $RUN graft.Bench > $OUT/bdup1.stdout 2>&1

# ---- 4. mutation paths (incl. the growth-default excursion, NEW) -----------
cool 120
$RUN graft.tools.MutationScale /root/testdata/sf0.1 $OUT/mut01.json > $OUT/mut01.stdout 2>&1
cool 120
$RUN graft.tools.MutationScale $OUT/sf1 $OUT/mut1.json > $OUT/mut1.stdout 2>&1

# ---- 5. composed-pipeline stage profile (incl. merge/* nesting, NEW) -------
cool 120; warm /root/testdata/sf0.1
$RUN graft.tools.ComposedProfile /root/testdata/sf0.1 $OUT/comp01.json > $OUT/comp01.stdout 2>&1
cool 120; warm $OUT/sf1
$RUN graft.tools.ComposedProfile $OUT/sf1 $OUT/comp1.json > $OUT/comp1.stdout 2>&1

# ---- 6. partitioned-layout incremental A/B at both scales (NEW) ------------
cool 120; warm /root/testdata/sf0.1
$RUN graft.tools.ProfileCdc /root/testdata/sf0.1 > $OUT/profcdc01.log 2>&1
cool 120; warm $OUT/sf1
$RUN graft.tools.ProfileCdc $OUT/sf1 > $OUT/profcdc1.log 2>&1

# ---- 7. full-set benches (the curve itself) --------------------------------
cool 180; warm /root/testdata/sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf01.json \
  $RUN graft.Bench > $OUT/bench_sf01.stdout 2>&1
cool 180; warm $OUT/sf1
SPARK_GRAFT_SF_DIR=$OUT/sf1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf1.json \
  $RUN graft.Bench > $OUT/bench_sf1.stdout 2>&1
# second sf1 full-set capture (r13 learning: sf1 in-JVM outliers can be
# 2-4x off on one capture; the r13 verdict's unreadable sf1 ratios get
# adjudicated from the min of two independent captures)
cool 180; warm $OUT/sf1
SPARK_GRAFT_SF_DIR=$OUT/sf1 SPARK_GRAFT_BENCH_OUT=$OUT/bench_sf1b.json \
  $RUN graft.Bench > $OUT/bench_sf1b.stdout 2>&1

echo "[campaign] done"
