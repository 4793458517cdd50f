#!/usr/bin/env python3
"""Time a subset of oracle SQL mirrors in DuckDB with per-query
incremental output (dev-only tooling, like check.py). Unlike Bench's
in-harness pairing, progress prints as it goes, so a slow mirror can't
silently eat the whole window.

Usage: time_oracle.py <sfDir> <oracle_sql.json> [q1,q2,...]
"""
import sys, json, time
import duckdb

sf, oracle_path = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
oracle = json.load(open(oracle_path))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
out = {}
for name in sorted(oracle):
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        con.execute(oracle[name]).df()
        out[name] = round(time.time() - t0, 3)
    except Exception as e:
        out[name] = -1.0
        print(f"  X {name}: {e}", flush=True)
    print(f"  {name}: {out[name]}s", flush=True)
print(json.dumps(out))
