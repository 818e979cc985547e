#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out>/oracle_sql.json in DuckDB over the sf tables,
canonicalizes both (columns sorted by name, rows sorted), and reports
exact-match / mismatch per query.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"MISSING {name} (no spark output)")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR   {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA  {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1
            continue
        if got.shape != want.shape:
            print(f"ROWS    {name}: spark={got.shape} oracle={want.shape}")
            n_bad += 1
            continue
        # dtype-tolerant exact compare
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    import numpy as np
                    eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
                else:
                    eq = (a.astype(str).values == b.astype(str).values)
                if not eq.all():
                    i = int((~eq).argmax())
                    mismatch = (c, i, a.iloc[i], b.iloc[i])
                    break
            except Exception as e:
                mismatch = (c, -1, "cmp-error", str(e)[:80])
                break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"VALUE   {name}: col={c} row={i} spark={av!r} oracle={bv!r}")
            n_bad += 1
        else:
            print(f"OK      {name} ({got.shape[0]} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
