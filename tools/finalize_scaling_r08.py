#!/usr/bin/env python3
"""Stamp SCALING_r08.json: take the merged sf0.1/sf1 document from
merge_scaling_r08.py and inject the measured output-growth decomposition
for the pair-producing dedup/decontamination rows (graft.tools.CountRows
numbers), plus methodology notes. Separate from the merge so the bench
numbers and the explanation text can iterate independently."""
import json, sys

src, out = sys.argv[1], sys.argv[2]
doc = json.load(open(src))

# graft.tools.CountRows at sf0.1 / sf1 (this round's corpus, current code)
output_rows = {
    "q_dedup_simhash_prod": (525, 212721),
    "q_dedup_ngram": (256, 250600),
    "q_dedup_minhash_prod": (256, 250597),
    "q_dedup_embed_lsh": (47, 89244),
    "q_dedup_semantic": (363, 98426),
    "q_decontaminate": (27, 25200),
    "q_decontaminate_bloom": (27, 25200),
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
doc["superlinear_explained"] = explained

doc["notes"] = [
    "No query exceeds 10x runtime at 10x data: every timed operator scales sub-linearly on this pair.",
    "Pair-producing dedup rows are OUTPUT-BOUND (see superlinear_explained): the adversarial clone "
    "generator inflates the true pair count 270-1900x; real corpora grow near-dup pairs ~linearly.",
    "q_dedup_simhash_prod dropped 41x -> 3.6x this round via signature-class collapse: banding runs over "
    "distinct 64-bit signatures, identical-signature classes emit hamming-0 pairs directly, and verified "
    "representative pairs expand to the member cross product — exact recall (spec-pinned), and the bucket "
    "cap now bounds signature diversity, not corpus size (capped runs previously LOST 3k true pairs at sf1).",
    "IVF/PQ probe ratios (5-7x) are the expected fixed-nlists shape: cells grow with the corpus at a "
    "build-time cell count, so the nprobe candidate scan grows ~linearly; the production path re-derives "
    "nlists from corpus size at (re)build (Dedup.AutoNlists / AnnModels persisted parameters).",
    "Both runs quiet (load_before 0.45 / 0.71) after idle cool-down + page-cache pre-warm of the input dirs; "
    "back-to-back full-set runs show +-10% total and up to 2x per-query drift on sub-second queries.",
    "sf1 throughputs: snapshot assembly parallelizes across all 32 cores (single-file sf0.1 inputs cannot), "
    "incremental holds ~5k changes/s (constant 5000-change batch by design).",
]
json.dump(doc, open(out, "w"), indent=1)
print("wrote", out, "median", doc["ratio_median"], "p90", doc["ratio_p90"], "n", doc["n_queries"])
