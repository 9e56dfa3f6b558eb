#!/usr/bin/env python3
"""Build the SCALING_r15.json skeleton from the two full-set Bench JSON
files (sf0.1 and .scale/sf1, both measured quiet at HEAD). Same shape as
round 9's merge; finalize_scaling_r15.py then injects the output-growth
decomposition, the bounded-dup-corpus rows, the mutation-path
measurements and the methodology notes."""
import json, statistics, sys

sf01_path, sf1_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
a = json.load(open(sf01_path))
b = json.load(open(sf1_path))

queries = {}
for q, t01 in a["queries"].items():
    t1 = b["queries"].get(q)
    if t1 is None:
        continue
    queries[q] = {
        "sf0_1_sec": round(t01, 3),
        "sf1_sec": round(t1, 3),
        "ratio": round(t1 / t01, 2) if t01 > 0 else None,
    }
ratios = sorted(v["ratio"] for v in queries.values() if v.get("ratio") is not None)
doc = {
    "round": 15,
    "data_factor": 10,
    "generator": "graft.tools.ScaleUp (sf0.1 replicated 10x; key-domain offsets; per-copy text salt + embedding jitter; dims fixed; 32 output files per table) + graft.tools.BoundedDup (fixed ~8% near-dup corpus for the pair-producing dedup rows)",
    "sf0_1": {
        "total_sec": a["value"],
        "load_before": a.get("load_before"),
        "load_after": a.get("load_after"),
        "snapshot_docs_per_sec": a.get("snapshot_docs_per_sec"),
        "snapshot_docs_per_sec_bucketed": a.get("snapshot_docs_per_sec_bucketed"),
        "incremental_changes_per_sec": a.get("incremental_changes_per_sec"),
        "incremental_changes_per_sec_partitioned": a.get("incremental_changes_per_sec_partitioned"),
    },
    "sf1": {
        "total_sec": b["value"],
        "load_before": b.get("load_before"),
        "load_after": b.get("load_after"),
        "snapshot_docs_per_sec": b.get("snapshot_docs_per_sec"),
        "snapshot_docs_per_sec_bucketed": b.get("snapshot_docs_per_sec_bucketed"),
        "incremental_changes_per_sec": b.get("incremental_changes_per_sec"),
        "incremental_changes_per_sec_partitioned": b.get("incremental_changes_per_sec_partitioned"),
    },
    "n_queries": len(queries),
    "ratio_median": round(statistics.median(ratios), 2) if ratios else None,
    "ratio_p90": round(ratios[int(0.9 * (len(ratios) - 1))], 2) if ratios else None,
    "queries": queries,
    "superlinear_explained": {},
    "bounded_dup": {},
    "mutation_paths": {},
    "notes": [],
}
json.dump(doc, open(out_path, "w"), indent=1)
worst = sorted(((q, v["ratio"]) for q, v in queries.items() if v.get("ratio") is not None), key=lambda x: -x[1])[:12]
print("queries:", len(queries), "median:", doc["ratio_median"], "p90:", doc["ratio_p90"])
for q, r in worst:
    print(f"  {q}: {r}x ({queries[q]['sf0_1_sec']}s -> {queries[q]['sf1_sec']}s)")
