#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  python3 scripts/local_verify.py [sfDir] [outDir] [--run] [names...]

With --run, first invokes `sbt "runMain graft.Verify <sfDir> <outDir>"`.
Then for each query result parquet in outDir, runs the matching oracle SQL
from outDir/oracle_sql.json in DuckDB over the same testdata parquet
tables, and compares rows / schema (column names) / value hash the way the
driver does (columns sorted by name, rows sorted, values hashed).
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # shortest round-trip repr; absorbs float32/float64 text diffs
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return list(df.columns), rows


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run = "--run" in sys.argv
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = set(args[2:])

    if run:
        subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", check=True)

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISS  {name}: no spark result")
            n_fail += 1
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(res_dir.glob("*.parquet"))],
            ignore_index=True) if list(res_dir.glob("*.parquet")) else pd.DataFrame()
        sql = oracles[name]
        if not sql:
            print(f"SKIP  {name}: rows-only ({len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        s_cols, s_rows = canon(spark_df)
        o_cols, o_rows = canon(oracle_df)
        if s_cols != o_cols:
            print(f"FAIL  {name}: schema spark={s_cols} oracle={o_cols}")
            n_fail += 1
        elif len(s_rows) != len(o_rows):
            print(f"FAIL  {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
        elif s_rows != o_rows:
            diffs = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
            i = diffs[0]
            print(f"FAIL  {name}: {len(diffs)} differing rows of {len(s_rows)};"
                  f" first at {i}:\n  spark : {s_rows[i]}\n  oracle: {o_rows[i]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
