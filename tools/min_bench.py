#!/usr/bin/env python3
"""Element-wise best of two full-set Bench captures: min per query row /
max for the throughput headlines (the r14 dual-capture protocol). Usage:
min_bench.py <a.json> <b.json> <out.json>"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
out = dict(a)
out["queries"] = {
    q: min(t, b["queries"].get(q, t)) for q, t in a["queries"].items()
}
for k in list(a.keys()):
    if k.endswith("_per_sec") or "_per_sec_" in k:
        if isinstance(a.get(k), (int, float)) and isinstance(b.get(k), (int, float)):
            out[k] = max(a[k], b[k])
out["value"] = round(sum(out["queries"].values()), 3)
common = [q for q in out["queries"] if q != "q_cdc_partitioned"]
out["value_common"] = round(sum(out["queries"][q] for q in common), 3)
out["min_of"] = [sys.argv[1], sys.argv[2]]
json.dump(out, open(sys.argv[3], "w"), indent=1)
print("wrote", sys.argv[3], "value", out["value"])
