#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name>/ parquet (Spark output) and compares against the
oracle SQL in <outDir>/oracle_sql.json executed by DuckDB over the same
testdata tables. Exact value compare after sorting columns by name and rows
by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize temporal/decimal-ish dtypes to strings for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "date")) or df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = normalize(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = normalize(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            n_fail += 1
        elif not got.equals(want):
            diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
            print(f"VALUES   {name}: differing cols={diff_cols}")
            for c in diff_cols[:3]:
                mask = got[c] != want[c]
                print(f"  {c}: spark={got[c][mask].head(3).tolist()} "
                      f"oracle={want[c][mask].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only checks for queries without an oracle, enumerated from the
    # INTENDED set (manifest.json) when available — a rows-only query that
    # crashed leaves no dump dir, and iterating only existing dirs would
    # pass right over it; without a manifest (older dumps) fall back to
    # the dirs that exist
    manifest_path = f"{out_dir}/manifest.json"
    if os.path.exists(manifest_path):
        rows_only = [n for n in json.load(open(manifest_path))
                     if n not in oracle]
    else:
        rows_only = [os.path.basename(d.rstrip("/"))
                     for d in sorted(glob.glob(f"{out_dir}/*/"))
                     if os.path.basename(d.rstrip("/")) not in oracle]
    for name in sorted(rows_only):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output (rows-only)")
            n_fail += 1
            continue
        n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        print(f"ROWSONLY {name}: {n} rows")
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracle queries")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
