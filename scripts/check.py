#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>
  (after `sbt "runMain graft.Verify <sfDir> <outDir>"`)

For each <outDir>/<name> parquet dump with an entry in oracle_sql.json,
runs the oracle SQL in DuckDB over the same tables and compares:
row count, column names, and a canonical value hash (columns sorted by
name, rows sorted, values stringified with float rounding).

Dev-only tool — NOT part of the engine (driver-side python is allowed
for checking; the engine itself is pure Scala/Spark).
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "NULL"
        if isinstance(v, (np.floating, float)):
            return f"{float(v):.6g}"
        if isinstance(v, (np.bool_, bool)):
            return str(bool(v))
        if isinstance(v, bytes):
            return v.hex()
        return str(v)
    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{p}/*.parquet"))],
            ignore_index=True) if glob.glob(f"{p}/*.parquet") else pd.DataFrame()
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  X {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        ok_rows = len(spark_df) == len(duck_df)
        ok_cols = sorted(spark_df.columns) == sorted(duck_df.columns)
        ok_hash = ok_rows and ok_cols and canon(spark_df) == canon(duck_df)
        if ok_hash:
            print(f"  + {name}: OK ({len(spark_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  X {name}: rows {len(spark_df)}/{len(duck_df)} cols_ok={ok_cols} hash_ok={ok_hash}")
            if ok_cols and ok_rows:
                s = spark_df.reindex(sorted(spark_df.columns), axis=1)
                dd = duck_df.reindex(sorted(duck_df.columns), axis=1)
                key = list(s.columns)
                s = s.sort_values(key, ignore_index=True)
                dd = dd.sort_values(key, ignore_index=True)
                for c in s.columns:
                    a, b = s[c], dd[c]
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        neq = ~np.isclose(a.astype(float), b.astype(float),
                                          rtol=0, atol=1e-9, equal_nan=True)
                    else:
                        neq = a.astype(str) != b.astype(str)
                    if neq.any():
                        i = int(np.argmax(np.asarray(neq)))
                        print(f"      col {c}: {int(neq.sum())} diffs, first at row {i}: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
            else:
                print(f"      spark cols: {sorted(spark_df.columns)}")
                print(f"      duck  cols: {sorted(duck_df.columns)}")
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
