#!/usr/bin/env python3
"""Merge a pair of SPARK_GRAFT_BENCH_ONLY bench runs (sf0.1 + sf1) into
SCALING_r07.json's per-query ratio table and recompute the summary stats."""
import json, re, statistics, sys

sf01_log, sf1_log = sys.argv[1], sys.argv[2]


def last_json(path):
    line = None
    for l in open(path, errors="replace"):
        if '"metric"' in l and '"queries"' in l:
            line = l
    m = re.search(r"\{.*\}", line)
    return json.loads(m.group(0))


a, b = last_json(sf01_log), last_json(sf1_log)
scal = json.load(open("/root/repo/SCALING_r07.json"))
for q, t01 in a["queries"].items():
    t1 = b["queries"].get(q)
    if t1 is None:
        continue
    scal["queries"][q] = {
        "sf0_1_sec": round(t01, 3),
        "sf1_sec": round(t1, 3),
        "ratio": round(t1 / t01, 2) if t01 > 0 else None,
    }
ratios = sorted(v["ratio"] for v in scal["queries"].values() if v.get("ratio"))
scal["ratio_median"] = round(statistics.median(ratios), 2)
scal["ratio_p90"] = round(ratios[int(0.9 * (len(ratios) - 1))], 2)
scal.setdefault("batch2_loads", {})
scal["batch2_loads"] = {
    "sf0_1": {"load_before": a.get("load_before"), "load_after": a.get("load_after")},
    "sf1": {"load_before": b.get("load_before"), "load_after": b.get("load_after")},
}
json.dump(scal, open("/root/repo/SCALING_r07.json", "w"), indent=1)
worst = sorted(
    ((q, v["ratio"]) for q, v in scal["queries"].items() if v.get("ratio")),
    key=lambda x: -x[1],
)[:8]
print("queries:", len(scal["queries"]), "median:", scal["ratio_median"], "p90:", scal["ratio_p90"])
print("worst:", worst)
