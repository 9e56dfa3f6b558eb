#!/usr/bin/env python3
"""Assemble SCALING_r16.json from the round-16 captures.

Round-16 scaling focus (r15 verdict task 7): the sf0.1 bench is
driver-overhead-bound (8-core == 32-core there), so the core-scaling
narrative moves to sf1 where compute dominates. Inputs: dual sf1 captures
at 32 and at 8 cores (element-wise min per core count), the sf0.1 closing
dual, and the regenerated-sf1 provenance (hash-verified against the r15
pinned record before any cross-round read).

Usage: finalize_scaling_r16.py <scale_dir> <sf1_prov.json> <out.json>
"""
import json, math, sys

sd, provp, out = sys.argv[1], sys.argv[2], sys.argv[3]

def load(p):
    return json.load(open(f"{sd}/{p}"))

def emin(a, b):
    q = {k: min(v, b["queries"].get(k, v)) for k, v in a["queries"].items()}
    m = dict(a)
    m["queries"] = q
    m["value"] = round(sum(q.values()), 3)
    for k in a:
        if k.endswith("_per_sec") or "_per_sec_" in k:
            if isinstance(a.get(k), (int, float)) and isinstance(b.get(k), (int, float)):
                m[k] = max(a[k], b[k])
    m["load_before"] = [a.get("load_before"), b.get("load_before")]
    m["load_after"] = [a.get("load_after"), b.get("load_after")]
    return m

sf01 = emin(load("closing_r16_a.json"), load("closing_r16_b.json"))
sf1_32 = emin(load("sf1_r16_32a.json"), load("sf1_r16_32b.json"))
sf1_8 = emin(load("sf1_r16_8a.json"), load("sf1_r16_8b.json"))

def ratio_table(num, den, floor=0.05):
    r = {}
    for q, t in num["queries"].items():
        d = den["queries"].get(q)
        if d and d > floor and t > 0:
            r[q] = round(t / d, 3)
    return r

# data scaling: sf1(32) / sf0.1(32), 10x data
data_r = ratio_table(sf1_32, sf01)
# core scaling AT SF1: 8-core / 32-core (4x fewer cores)
core_r = ratio_table(sf1_8, sf1_32)

def med_p90(d):
    v = sorted(d.values())
    return (v[len(v) // 2], v[int(len(v) * 0.9)]) if v else (None, None)

dm, dp = med_p90(data_r)
cm, cp = med_p90(core_r)

headline = [
    "q_lifecycle", "q_composed_build", "q_composed_cdc",
    "q_dedup_cluster_incr_prod", "q_cdc_root", "q_bm25_index_build",
    "q_curation_pipeline", "q_image_ann", "q_ann_ivfpq", "q_dsir",
]
core_head = {
    q: {
        "sf1_32c_sec": sf1_32["queries"].get(q),
        "sf1_8c_sec": sf1_8["queries"].get(q),
        "ratio_8c_over_32c": core_r.get(q),
        "sf01_over_sf1_x10_ratio": data_r.get(q),
    }
    for q in headline if q in sf1_32["queries"]
}

doc = {
    "round": 16,
    "data_factor": 10,
    "generator": "graft.tools.ScaleUp (sf0.1 replicated 10x; key-domain offsets; per-copy text salt + embedding jitter; dims fixed; 32 output files per table); corpus REGENERATED this round and hash-verified byte-equivalent to the r15 pinned record before any cross-round read",
    "sf0_1": {
        "value": sf01["value"],
        "value_common": sf01.get("value_common"),
        "snapshot_docs_per_sec": sf01.get("snapshot_docs_per_sec"),
        "snapshot_docs_per_sec_bucketed": sf01.get("snapshot_docs_per_sec_bucketed"),
        "incremental_changes_per_sec": sf01.get("incremental_changes_per_sec"),
        "incremental_changes_per_sec_partitioned": sf01.get("incremental_changes_per_sec_partitioned"),
        "loads": [sf01["load_before"], sf01["load_after"]],
    },
    "sf1_32c": {
        "value": sf1_32["value"],
        "value_common": sf1_32.get("value_common"),
        "snapshot_docs_per_sec": sf1_32.get("snapshot_docs_per_sec"),
        "snapshot_docs_per_sec_bucketed": sf1_32.get("snapshot_docs_per_sec_bucketed"),
        "incremental_changes_per_sec": sf1_32.get("incremental_changes_per_sec"),
        "incremental_changes_per_sec_partitioned": sf1_32.get("incremental_changes_per_sec_partitioned"),
        "loads": [sf1_32["load_before"], sf1_32["load_after"]],
    },
    "sf1_8c": {
        "value": sf1_8["value"],
        "value_common": sf1_8.get("value_common"),
        "snapshot_docs_per_sec": sf1_8.get("snapshot_docs_per_sec"),
        "snapshot_docs_per_sec_bucketed": sf1_8.get("snapshot_docs_per_sec_bucketed"),
        "incremental_changes_per_sec": sf1_8.get("incremental_changes_per_sec"),
        "incremental_changes_per_sec_partitioned": sf1_8.get("incremental_changes_per_sec_partitioned"),
        "loads": [sf1_8["load_before"], sf1_8["load_after"]],
    },
    "data_scaling_sf1_over_sf01": {
        "n": len(data_r), "median": dm, "p90": dp, "per_query": data_r,
    },
    "core_scaling_at_sf1_8c_over_32c": {
        "n": len(core_r), "median": cm, "p90": cp,
        "total_ratio": round(sf1_8["value"] / sf1_32["value"], 3),
        "per_query": core_r,
        "note": "captures are element-wise min of dual quiet runs per core count; 4x fewer cores -> a compute-bound row reads toward 4.0, a driver-overhead-bound row toward 1.0 (the r15 verdict measured ~1.03 TOTAL at sf0.1, which is why the core-scaling narrative lives at sf1)",
    },
    "headline_rows": core_head,
    "sf1_provenance": json.load(open(provp)),
}
json.dump(doc, open(out, "w"), indent=1)
print("wrote", out)
print("sf1 32c:", sf1_32["value"], "| 8c:", sf1_8["value"],
      "| total core ratio:", round(sf1_8["value"] / sf1_32["value"], 3),
      "| core median:", cm, "p90:", cp)
print("data ratio median:", dm, "p90:", dp)
