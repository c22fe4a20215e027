#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each SQL in
DuckDB with views named after the parquet tables in <sfDir>, and compares
against the Spark result parquet in <outDir>/<name>/. Columns are sorted by
name and rows by all columns before comparing (matching the driver's
hash-compare semantics as described in the brief).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize float-ish columns to plain float64 for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # spill-enabled: heavy oracle replays (c9's per-day brute-force chain
    # at sf1) exceed the default in-memory budget; a temp dir lets DuckDB
    # spill instead of dying on a bad allocation
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if exp.shape != got.shape:
            print(f"FAIL {name}: shape exp={exp.shape} got={got.shape}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(exp, got, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch")
            msg = str(e).splitlines()
            print("  " + "\n  ".join(msg[:6]))
            # show first differing rows
            neq = (exp.astype(str) != got.astype(str)).any(axis=1)
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"  row {i} exp: {exp.loc[i].to_dict()}")
                print(f"  row {i} got: {got.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
