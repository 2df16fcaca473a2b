#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_local.py <verify_out_dir> <sf_dir> [query ...]

Loads each <out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir parquet tables,
and compares: row count, schema (column names sorted), and exact values
(dtype-sensitive, like the driver's hash compare).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a.shape != b.shape:
        return False, "shape"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if str(a[c].dtype) != str(b[c].dtype):
            return False, f"dtype[{c}]: {a[c].dtype} vs {b[c].dtype}"
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if isinstance(x, (np.ndarray, list)) or isinstance(y, (np.ndarray, list)):
                if list(x) != list(y):
                    return False, f"value[{c}][{i}]: {x!r} vs {y!r}"
            elif pd.isna(x) and pd.isna(y):
                continue
            elif x != y:
                return False, f"value[{c}][{i}]: {x!r} vs {y!r}"
    return True, None

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            n_noracle += 1
            print(f"  ?  {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        s, o = norm(spark_df), norm(odf)
        if len(s) != len(o):
            n_fail += 1
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            continue
        if list(s.columns) != list(o.columns):
            n_fail += 1
            print(f"FAIL {name}: cols {list(s.columns)} vs {list(o.columns)}")
            continue
        ok, why = values_equal(s, o)
        if ok:
            n_pass += 1
            print(f"  ok {name} ({len(s)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {why}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
