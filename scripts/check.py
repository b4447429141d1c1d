#!/usr/bin/env python3
"""Local oracle checker (mirrors the driver's Verify->DuckDB compare).

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the sf_dir
tables, sorts columns by name + rows by all columns, and compares.
Driver-side python deps only (duckdb/pandas) - NOT part of the library.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}"); n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}"); n_bad += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    bad = ~((a.isna() & b.isna()) | (abs(a.astype(float) - b.astype(float)) <= 1e-9))
                else:
                    bad = ~((a.isna() & b.isna()) | (a.astype(str) == b.astype(str)))
            except Exception as e:
                mismatch = f"col {c}: {e}"; break
            if bad.any():
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r} ({int(bad.sum())} diffs)"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); n_bad += 1
        else:
            # dtype note: values match but physical types differ — the
            # driver's schema compare may be stricter than ours
            tnote = ""
            diffs = [f"{c}:{got[c].dtype}!={exp[c].dtype}"
                     for c in got.columns if got[c].dtype != exp[c].dtype]
            if diffs:
                tnote = "  [dtype: " + ", ".join(diffs) + "]"
            print(f"OK   {name} ({len(got)} rows){tnote}"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
