#!/usr/bin/env python3
"""Stamp SCALING_r15.json: take the merged sf0.1/sf1 document from
merge_scaling_r15.py and inject (a) the output-growth decomposition for
the pair-producing rows on the CLONE corpus (graft.tools.CountRows at
both scales, current code), (b) the bounded-dup-corpus measurements (the
round-10 addition: fixed ~8% near-dup rate, so the ratios measure
compute, not answer growth), (c) the persisted-index MUTATION-path
measurements for all three families (BM25 / LSH / IVF-PQ), and (d) the
methodology notes.

CountRows logs are the `[count] <query> <rows>` lines printed by
`graft.tools.CountRows`.

Usage: finalize_scaling_r15.py <merged.json> <mut01.json> <mut1.json>
                               <bdup01.json> <bdup1.json>
                               <cnt01.log> <cnt1.log> <cntb01.log> <cntb1.log>
                               <comp01.json> <comp1.json>
                               <profcdc01.log> <profcdc1.log> <provenance.json>
                               <recall_bdup5k.json> <recall_bdup50k.json>
                               <sf1_a.json> <sf1_b.json> <sf1_c.json> <sf1_d.json>
                               <notes.json> <out.json>
"""
import json, re, sys

(src, mut01, mut1, bd01, bd1,
 cnt01, cnt1, cntb01, cntb1, comp01, comp1,
 profcdc01, profcdc1, provenance_path,
 recall_b5k, recall_b50k, sf1_a, sf1_b, sf1_c, sf1_d,
 notes_path, out) = sys.argv[1:23]
doc = json.load(open(src))


def counts(path):
    out = {}
    for line in open(path):
        m = re.match(r"\[count\] (\S+) (\d+)", line.strip())
        if m:
            out[m.group(1)] = int(m.group(2))
    return out


c01, c1 = counts(cnt01), counts(cnt1)
explained = {}
for q in sorted(set(c01) & set(c1)):
    if q not in doc["queries"]:
        continue
    a, b = c01[q], c1[q]
    growth = round(b / a, 1) if a else None
    t = doc["queries"][q]
    bound = "output-bound" if growth is not None and growth > 15 else "near-linear output"
    explained[q] = {
        "output_rows_sf0_1": a,
        "output_rows_sf1": b,
        "output_growth": growth,
        "time_ratio": t["ratio"],
        "verdict": f"{bound} on the clone corpus (TRUE answer grows {growth}x at 10x "
                   f"rows while runtime grows {t['ratio']}x); the clone generator makes "
                   "every doc/vector a mutual near-dup of its 9 copies — see "
                   "bounded_dup for the fixed-rate corpus where the same operators "
                   "measure compute scaling",
    }
doc["superlinear_explained"] = explained

# bounded-dup corpus: 5k vs 50k rows, ~8% near-dup rate by construction
a = json.load(open(bd01))
b = json.load(open(bd1))
cb01, cb1 = counts(cntb01), counts(cntb1)
bdq = {}
for q, t01 in a["queries"].items():
    t1 = b["queries"].get(q)
    if t1 is None:
        continue
    bdq[q] = {
        "rows_5k_sec": round(t01, 3),
        "rows_50k_sec": round(t1, 3),
        "ratio": round(t1 / t01, 2) if t01 else None,
        "output_rows": [cb01.get(q), cb1.get(q)],
        "output_growth": (round(cb1[q] / cb01[q], 1)
                          if cb01.get(q) and cb1.get(q) else None),
    }
doc["bounded_dup"] = {
    "generator": "graft.tools.BoundedDup: 60 unique hash tokens per doc; ids with "
                 "id%12==1 copy their predecessor's tokens plus 6 extra (~8% of docs "
                 "in a near-dup pair, token Jaccard 0.91); 256-dim hash-uniform "
                 "embeddings with partner = base + 0.01*jitter (cosine ~0.9999), "
                 "measured zero accidental cosine>0.4 pairs",
    "load_before": [a.get("load_before"), b.get("load_before")],
    "queries": bdq,
}

doc["mutation_paths"] = {
    "method": "graft.tools.MutationScale: build index over documents/embeddings, "
              "probe with a 50-query workload (min-of-3, untimed warm-up first), "
              "delete 10% twice (single-shot timings), probe at 10%/20% dead, "
              "policy compaction (maybeCompact* at 0.15) via generation-pointer "
              "promotion, probe after; BM25 (exact and, since r11, the impact-capped pruned probe rows probe_pruned_*) + LSH + IVF-PQ, plus the "
              "streaming cluster-maintenance family (SignatureIndex + ClusterMap; "
              "verbs: seed the corpus, apply a 10%-of-corpus change batch, replay "
              "it, compact, with assignments-read probes)",
    "sf0_1": json.load(open(mut01)),
    "sf1": json.load(open(mut1)),
}

# composed-pipeline stage profile at both scales (r12 addition): every
# seed / applyBatch / probe leg of the six-consumer scenario, plus the
# cluster applyBatch's internal stage attribution, with 10x ratios — the
# direct evidence that the now-default impact-capped BM25 probe leg and
# the batch-sized maintenance legs stay ~flat as the corpus grows
a01, a1 = json.load(open(comp01)), json.load(open(comp1))
comp = {}
for k, v01 in a01.items():
    if k == "sf":
        continue
    v1 = a1.get(k)
    comp[k] = {
        "sf0_1_sec": round(v01, 3),
        "sf1_sec": round(v1, 3) if v1 is not None else None,
        "ratio": round(v1 / v01, 2) if v1 and v01 else None,
    }
doc["composed_profile"] = {
    "method": "graft.tools.ComposedProfile at sf0.1 and sf1 (single-shot per "
              "stage, quiet, page-cache pre-warmed): the q_composed scenario's "
              "seed builds, per-consumer applyBatch legs (cluster applyBatch "
              "stage-attributed), and every probe leg",
    "stages": comp,
}

# partitioned-layout incremental A/B (r13 addition): ProfileCdc's four-cell
# flat/partitioned x staged/full instrument at both scales, best-of-3 per
# cell — the direct evidence for the layout answer to the scan-bounded
# incremental floor (a key-clustered 5000-change batch must stay ~flat in
# corpus size at the partitioned layout)
def profcdc_cells(path):
    import collections
    best = collections.defaultdict(lambda: float("inf"))
    for line in open(path):
        m = re.match(
            r"\[profile\] (flat|part)\d: (clustered .+|feed-shaped full process noop): ([0-9.]+) s",
            line.strip())
        if m:
            key = f"{m.group(1)}/{m.group(2).replace(' ', '_')}"
            best[key] = min(best[key], float(m.group(3)))
    return {k: round(v, 3) for k, v in sorted(best.items())}

p01, p1 = profcdc_cells(profcdc01), profcdc_cells(profcdc1)
doc["partitioned_cdc"] = {
    "method": "graft.tools.ProfileCdc partitioned section: the Bench-shaped "
              "key-CLUSTERED 5000-change batch (top of the key space, the "
              "production churn shape) A/B'd across {flat, key-partitioned} "
              "layouts x {affectedRoots, reassemble, full process}, best-of-3, "
              "one-time layout prep untimed (amortized, the bucketed-snapshot "
              "convention); partitioned widths orders/lineitem 16384, customer "
              "2048 keys per directory. r14 adds the feed-shaped cells: the "
              "same 5000 changes as driver-local rows (LocalRelation — zero "
              "corpus-derived lineage in the batch plan), so any sf growth "
              "there is engine cost by construction",
    "sf0_1": p01,
    "sf1": p1,
    "ratios_at_10x": {
        k: round(p1[k] / p01[k], 2) for k in p01 if k in p1 and p01[k] > 0
    },
}

# corpus provenance (r13 addition): per-table row counts + order-independent
# content hashes of the generated sf1 corpus, so future rounds can verify
# corpus identity before reading cross-round medians
doc["sf1_provenance"] = {
    "method": "DuckDB sum(hash(struct_pack(*))) per table over "
              ".scale/sf1/<table>.parquet — order-independent content hash; "
              "equal hashes across rounds mean byte-equivalent corpora "
              "(ScaleUp is deterministic), so any median drift is machine-day",
    "tables": json.load(open(provenance_path)),
}

# ANN training-quality cell (r14 verdict task 4): recall@50 of the shipped
# refine=0 seed default vs refine=2 Lloyd vs the full-probe contrast, on
# the clone corpus (via MutationScale) AND the bounded-dup corpus
mut01_doc = json.load(open(mut01))
mut1_doc = json.load(open(mut1))
doc["ann_recall_at50"] = {
    "method": "graft.tools.RecallScale: recall@50 vs exact brute-force cosine "
              "for 50 queries; ivf/ivfpq at nlists=16 nprobe=4 with refine=0 "
              "(shipped deterministic default) vs refine=2 (Lloyd, same seeds) "
              "vs nprobe=16 full probe (isolates quantization loss from "
              "cell-assignment loss)",
    "sf0_1": mut01_doc.get("recall_at50"),
    "sf1": mut1_doc.get("recall_at50"),
    "bdup5k": json.load(open(recall_b5k)).get("recall_at50"),
    "bdup50k": json.load(open(recall_b50k)).get("recall_at50"),
}

# sf1 capture-drift experiment (r14 verdict task 3): a/b plain captures
# (the r14 dual-capture baseline) vs c/d with SPARK_GRAFT_BENCH_SETTLE=1
# (full GC + 200 ms pause before each query); per-row drift = max/min of
# the pair, gc_ms recorded per row for attribution
import statistics as _st
def _drift(p1, p2):
    x = json.load(open(p1)); y = json.load(open(p2))
    rows = {}
    for q, t1 in x["queries"].items():
        t2 = y["queries"].get(q)
        if t2 is None or min(t1, t2) <= 0:
            continue
        rows[q] = round(max(t1, t2) / min(t1, t2), 2)
    d = sorted(rows.values())
    return {
        "rows": rows,
        "median": round(_st.median(d), 2) if d else None,
        "p90": round(d[int(0.9 * (len(d) - 1))], 2) if d else None,
        "max": max(d) if d else None,
        "n_over_1_2": sum(1 for v in d if v > 1.2),
        "totals": [x.get("value_common", x.get("value")), y.get("value_common", y.get("value"))],
        "gc_ms_totals": [sum(x.get("gc_ms", {}).values()) or None,
                         sum(y.get("gc_ms", {}).values()) or None],
    }
doc["sf1_capture_drift"] = {
    "method": "four back-to-back quiet sf1 full-set captures at final HEAD: "
              "a/b plain (dual-capture baseline), c/d with "
              "SPARK_GRAFT_BENCH_SETTLE=1 (System.gc + 200 ms before each "
              "query); drift = per-row max/min within each pair",
    "plain_ab": _drift(sf1_a, sf1_b),
    "settle_cd": _drift(sf1_c, sf1_d),
}

doc["notes"] = json.load(open(notes_path))
json.dump(doc, open(out, "w"), indent=1)
print("wrote", out)
