#!/usr/bin/env python3
"""Per-table row counts + order-independent content hashes of a generated
corpus dir (DuckDB sum(hash(struct_pack(*))) — row order and file layout
irrelevant). Recording these per round lets a later round verify corpus
identity before reading cross-round SCALING medians: ScaleUp is
deterministic, so equal hashes mean byte-equivalent corpora and any
median drift is machine-day, not data.

Usage: sf1_provenance.py <corpusDir> <out.json>
"""
import duckdb, json, sys

src, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
prov = {}
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet/*.parquet')").fetchall()]
    packed = ", ".join(f'"{c}" := "{c}"' for c in cols)
    n, h = con.execute(
        f"""SELECT count(*), sum(hash(struct_pack({packed})))
            FROM read_parquet('{src}/{t}.parquet/*.parquet')""").fetchone()
    prov[t] = {"rows": n, "content_hash": str(int(h) % (2 ** 64))}
json.dump(prov, open(out, "w"), indent=1)
print("wrote", out)
