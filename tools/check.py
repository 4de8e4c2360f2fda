#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the fixture parquet tables, compare to Verify.scala's parquet
dumps (columns sorted by name, rows sorted by all columns, exact values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import glob, os

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp(a, b, name):
    if list(a.columns) != list(b.columns):
        return f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"row count differ: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return (f"col {c} row {i}: {x!r} != {y!r} "
                            f"(diff {abs(x-y):.3e})")
            else:
                xx = None if x is None or x != x else x
                yy = None if y is None or y != y else y
                if isinstance(x, float) and pd.isna(x): xx = None
                if isinstance(y, float) and pd.isna(y): yy = None
                if xx != yy and str(xx) != str(yy):
                    return f"col {c} row {i}: {xx!r} != {yy!r}"
    return None

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
        err = cmp(canon(spark_df), canon(odf), name)
        if err:
            print(f"FAIL {name}: {err}"); fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
