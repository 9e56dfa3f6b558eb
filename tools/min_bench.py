#!/usr/bin/env python3
"""Element-wise best of two full-set Bench captures: min per query row /
max for the throughput headlines (the r14 dual-capture protocol). Per-query
gc_ms is carried from WHICHEVER capture supplied the winning time — copying
one capture's gc map wholesale would attribute collector time to timings
taken from the other run. load_before/load_after are reported as a pair so
the merged artifact doesn't claim one capture's box state for both. Usage:
min_bench.py <a.json> <b.json> <out.json>"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
out = dict(a)
out["queries"] = {
    q: min(t, b["queries"].get(q, t)) for q, t in a["queries"].items()
}
ga, gb = a.get("gc_ms") or {}, b.get("gc_ms") or {}
if ga or gb:
    out["gc_ms"] = {
        q: (ga if t == a["queries"].get(q) else gb).get(q)
        for q, t in out["queries"].items()
    }
for k in list(a.keys()):
    if k.endswith("_per_sec") or "_per_sec_" in k:
        if isinstance(a.get(k), (int, float)) and isinstance(b.get(k), (int, float)):
            out[k] = max(a[k], b[k])
for k in ("load_before", "load_after"):
    if k in a and k in b:
        out[k] = [a[k], b[k]]
out["value"] = round(sum(out["queries"].values()), 3)
common = [q for q in out["queries"] if q != "q_cdc_partitioned"]
out["value_common"] = round(sum(out["queries"][q] for q in common), 3)
out["min_of"] = [sys.argv[1], sys.argv[2]]
json.dump(out, open(sys.argv[3], "w"), indent=1)
print("wrote", sys.argv[3], "value", out["value"])
