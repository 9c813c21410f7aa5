#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the raw
parquet tables in <sfDir>, and compares values (columns sorted by name,
rows sorted by all columns, float-tolerant only in the report, not the
verdict).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_df = load(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        ok = True
        detail = ""
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                eq = (pd.isna(av) & pd.isna(bv)) | (av == bv)
            elif av.dtype.kind == 'M' or bv.dtype.kind == 'M':
                eq = pd.Series(av).astype('datetime64[us]').eq(
                     pd.Series(bv).astype('datetime64[us]')) | (pd.isna(av) & pd.isna(bv))
                eq = eq.to_numpy()
            else:
                eq = (pd.Series(av).astype(object).where(~pd.isna(av), None) ==
                      pd.Series(bv).astype(object).where(~pd.isna(bv), None)).to_numpy() \
                     | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                bad = int((~eq).sum())
                i = int(np.argmax(~eq))
                detail += f" col {c}: {bad} diffs, first at row {i}: {av[i]!r} vs {bv[i]!r};"
                ok = False
        # dtype drift report (not a verdict)
        dt = [f"{c}:{a[c].dtype}!={b[c].dtype}" for c in a.columns if a[c].dtype != b[c].dtype]
        if ok:
            n_pass += 1
            note = f"  [dtype drift: {','.join(dt)}]" if dt else ""
            print(f"PASS {name} ({len(a)} rows){note}")
        else:
            n_fail += 1
            print(f"FAIL {name}:{detail}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
