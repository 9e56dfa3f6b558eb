#!/usr/bin/env python3
"""Stamp SCALING_r09.json: take the merged sf0.1/sf1 document from
merge_scaling_r09.py and inject (a) the measured output-growth
decomposition for the pair-producing rows (graft.tools.CountRows, this
round's corpus at both scales), (b) the persisted-index MUTATION-path
measurements (graft.tools.MutationScale at both scales), and (c) the
methodology notes. Separate from the merge so bench numbers and the
explanation text iterate independently."""
import json, sys

src, mut01, mut1, out = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
doc = json.load(open(src))

# graft.tools.CountRows at sf0.1 / sf1 (measured this round, current code)
output_rows = {
    "q_dedup_simhash_prod": (525, 212721),
    "q_dedup_ngram": (256, 250600),
    "q_dedup_minhash_prod": (256, 250597),
    "q_dedup_embed_lsh": (47, 89244),
    "q_dedup_semantic": (363, 98426),
    "q_decontaminate": (27, 25200),
    "q_decontaminate_bloom": (27, 25200),
    "q_dedup_span_ranges": (435, 46948),
}

explained = {}
for q, (a, b) in output_rows.items():
    if q not in doc["queries"]:
        continue
    growth = round(b / a, 1)
    t = doc["queries"][q]
    explained[q] = {
        "output_rows_sf0_1": a,
        "output_rows_sf1": b,
        "output_growth": growth,
        "time_ratio": t["ratio"],
        "verdict": "output-bound: the 10x-clone corpus makes every document/vector "
                   "a mutual near-dup of its 9 copies, so the TRUE answer grows "
                   f"{growth}x while runtime grows {t['ratio']}x — per-output-pair "
                   "cost falls with scale",
    }
if "q_dsir" in doc["queries"]:
    explained["q_dsir"] = {
        "output_rows_sf0_1": 100,
        "output_rows_sf1": 100,
        "output_growth": 1.0,
        "time_ratio": doc["queries"]["q_dsir"]["ratio"],
        "verdict": "corpus-linear by design: DSIR's importance weights hash every "
                   "document's n-grams against the target distribution (one corpus "
                   "pass), then draw a FIXED 100-doc sample — 10x corpus, "
                   f"{doc['queries']['q_dsir']['ratio']}x time, constant output",
    }
doc["superlinear_explained"] = explained

# graft.tools.MutationScale at both scales (persisted BM25/LSH index
# delete/probe/compact paths — the round-8 mutation machinery)
doc["mutation_paths"] = {
    "method": "graft.tools.MutationScale: build index over documents/embeddings, "
              "probe with a 50-query workload (min-of-3, untimed warm-up first), "
              "delete 10% twice (single-shot timings), probe at 10%/20% dead, "
              "policy compaction (maybeCompact* at 0.15), probe after",
    "sf0_1": json.load(open(mut01)),
    "sf1": json.load(open(mut1)),
    "verdicts": [
        "delete batch cost is O(batch), not O(index): 10x batch (500 -> 5000 ids) costs "
        "1.3x (BM25 ~2.7-3.1s -> ~3.8-3.9s; LSH ~0.6-0.7s -> ~1.1s) — the batch's bucket "
        "keys + doclens lookups dominate, the postings/cells are never scanned",
        "tombstone probe overhead is candidate-sized, not corpus-sized: at sf1 the BM25 "
        "50-query workload probes 7.9s at 20% dead vs 6.4s post-compaction on the same "
        "visible corpus (~1.2x for the visibility left-join over candidates); LSH "
        "probes are statistically flat (0.9-1.3s across 0/10/20% dead)",
        "probe cost tracks VISIBLE corpus: BM25 clean probe 10.7s over 50k docs falls to "
        "6.4-7.9s once 20% is deleted — deletes shrink the candidate set, tombstones "
        "subtract before df/tf aggregation",
        "compaction cost is bounded by the parallel rewrite, not tombstone count: a full "
        "rewrite+swap at 20% dead takes ~4.3s/~4.8s (BM25) and ~3.0s/~3.3s (LSH) at "
        "sf0.1/sf1 — 10x corpus costs ~1.1x wall-clock because the bucket-partitioned "
        "rewrite uses all cores",
        "auto-compaction decision stayed sidecar-cheap at both scales (stats + footer "
        "counts; the policy check itself is not separately measurable above noise)",
    ],
}

doc["notes"] = [
    "No query exceeds 10x runtime at 10x data (worst 9.31x, median 1.83x, p90 3.83x): "
    "every timed operator scales sub-linearly on this pair.",
    "Pair-producing dedup rows are OUTPUT-BOUND (see superlinear_explained): the "
    "adversarial clone generator inflates the true pair count 108-1900x; real corpora "
    "grow near-dup pairs ~linearly.",
    "q_dedup_simhash_prod holds at 7.8x (r7: 13.6x) under the r8 signature-class "
    "collapse; q_dedup_semantic at 9.3x is graded at AutoNlists (cells grow with the "
    "corpus, per-cell verify constant) with 271x output growth.",
    "INPUT LAYOUT MATTERS AS MUCH AS THE PLAN: the first r9 sf1 run measured "
    "q_dedup_ngram 41s / q_cdc_child 20s / flagship 6.2s on a 10-file-per-table corpus "
    "(one ~10MB single-rowgroup file per copy caps scans at 10-way parallelism on 32 "
    "cores). Regenerating the SAME rows as 32 files per table (ScaleUp now fans out "
    "the write) cut those to 15.7s / 3.6s / 5.4s and the total from 220s to 204s — at "
    "100TB this is the small-files/rowgroup-sizing discipline, rehearsed at sf1.",
    "Both runs quiet at launch (load_before 1.14 / 0.72) after idle cool-down + "
    "page-cache pre-warm; -Xmx32g per the r8 GC protocol (ARCHITECTURE.md).",
    "sf1 throughputs: snapshot 233.8k docs/s plain / 234.5k bucketed (the 32-file "
    "corpus parallelizes the scan), incremental 4.3k changes/s (constant 5000-change "
    "batch by design; 4.3-7k across rounds is the drift band).",
    "BM25 split landed this round: q_bm25_index_build 1.68s -> 2.36s (1.4x for 10x "
    "corpus: tokenize+write parallelizes) and q_bm25_indexed steady-state probe "
    "0.92s -> 1.27s (1.4x; term-bucket pruning holds as the corpus grows).",
]
json.dump(doc, open(out, "w"), indent=1)
print("wrote", out, "median", doc["ratio_median"], "p90", doc["ratio_p90"], "n", doc["n_queries"])
