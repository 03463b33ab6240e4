#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB against the same parquet
tables, loads the Spark result parquet written by graft.Verify, normalizes
both (columns sorted by name, rows sorted by all columns), and diffs.

Usage: validate.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        try:
            got = norm(duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            failed.append(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} "
                  f"oracle={list(want.columns)}")
            failed.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            failed.append(name)
            continue
        # Dtype-kind-strict: the driver hashes value representations, so an
        # oracle column arriving as float64 (e.g. DuckDB HUGEINT from a
        # window sum coerced by pandas) against an integer Spark column IS a
        # failure even when values compare equal ("3.0" vs "3"). Integer
        # WIDTH differences (int32 vs int64) hash identically and pass.
        def kind(dt):
            return "i" if dt.kind in "iu" else dt.kind
        dtype_bad = [c for c in got.columns
                     if kind(got[c].dtype) != kind(want[c].dtype)]
        if dtype_bad:
            for c in dtype_bad:
                print(f"FAIL {name}: dtype-kind mismatch col={c} "
                      f"spark={got[c].dtype} oracle={want[c].dtype}")
            failed.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name}: {len(got)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:500]}")
            # show first differing cells
            for c in got.columns:
                neq = (got[c] != want[c]) & ~(got[c].isna() & want[c].isna())
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col={c} row={i} spark={got[c][i]!r} "
                          f"oracle={want[c][i]!r} (n={int(neq.sum())})")
            failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} PASS"
          + (f"; FAILED: {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
