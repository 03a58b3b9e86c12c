#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sfDir>'s parquet tables, and
compares: columns sorted by name, rows sorted, values compared exactly
(floats to 1e-12 relative for reporting, but exact mismatches are flagged
since the driver hashes).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable sort over all columns stringified (handles mixed/NaN)
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1) if len(df) else None
    if key is not None:
        df = df.loc[key.sort_values(kind="mergesort").index]
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark directory output (e.g. the ScaleGen 100x dir)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_rows_only = 0
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        spark_df = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            status = "ROWS-ONLY" if len(spark_df) > 0 else "ROWS-ONLY(EMPTY!)"
            print(f"{status}  {name}: {len(spark_df)} rows"); n_rows_only += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns spark={list(a.columns)} duck={list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        mism = []
        for c in a.columns:
            av, bv = a[c], b[c]
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                mism.append(f"{c}[row {i}]: spark={av[i]!r} duck={bv[i]!r} ({int((~eq).sum())} diffs)")
        if mism:
            print(f"FAIL  {name}: " + "; ".join(mism[:3])); n_fail += 1
        else:
            print(f"PASS  {name}: {len(a)} rows x {len(a.columns)} cols"); n_pass += 1
    # a declared query with NO output dir crashed in Verify — flag it loudly
    # instead of silently skipping (stale-output hazard found in round 2)
    declared_path = os.path.join(out_dir, "_declared.txt")
    if os.path.exists(declared_path):
        declared = set(open(declared_path).read().split())
        missing = sorted(declared - set(names))
        for name in missing:
            if only and name not in only:
                continue
            print(f"FAIL  {name}: MISSING output (query crashed in Verify)")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
