#!/usr/bin/env python3
"""Local replica of the round driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against views
over <sfDir>/*.parquet, and compares with the Spark parquet results written by
`graft.Verify` — columns sorted by name, rows sorted by all columns, values
compared exactly (integers/strings/bools/timestamps) or bit-exactly (floats,
with a near-miss report). Exit code 1 if any query mismatches.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df.reset_index(drop=True)


def compare(name, a: pd.DataFrame, b: pd.DataFrame) -> list:
    errs = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} duck={len(b)}"]
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_datetime64_any_dtype(x) or pd.api.types.is_datetime64_any_dtype(y):
            x = pd.to_datetime(x).astype("datetime64[us]")
            y = pd.to_datetime(y).astype("datetime64[us]")
            bad = (x != y) & ~(x.isna() & y.isna())
        elif pd.api.types.is_integer_dtype(x) and pd.api.types.is_integer_dtype(y):
            bad = x.astype("int64") != y.astype("int64")
        elif pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xv, yv = x.astype("float64").values, y.astype("float64").values
            exact = (xv == yv) | (np.isnan(xv) & np.isnan(yv))
            if not exact.all():
                close = np.isclose(xv, yv, rtol=1e-9, atol=1e-12, equal_nan=True)
                n_near = int((~exact & close).sum())
                n_far = int((~close).sum())
                errs.append(f"col {c}: {n_near} near-miss, {n_far} far "
                            f"(first: spark={xv[~exact][0]!r} duck={yv[~exact][0]!r})")
            continue
        else:
            bad = x.astype(str) != y.astype(str)
        if bad.any():
            i = bad.idxmax()
            errs.append(f"col {c}: {int(bad.sum())} mismatches "
                        f"(first at row {i}: spark={x[i]!r} duck={y[i]!r})")
    return errs


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark parquet output")
            failed.append(name)
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"[rows] {name}: {len(spark_df)} rows (no oracle; rows-only)")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        errs = compare(name, norm(spark_df), norm(duck_df))
        if errs:
            print(f"[FAIL] {name}: " + "; ".join(errs))
            failed.append(name)
        else:
            print(f"[OK]   {name}: {len(spark_df)} rows hash-equal")
    missing = sorted(set(oracle) - set(os.listdir(outdir)))
    for m in missing:
        print(f"[FAIL] {m}: oracle present but no spark output dir")
        failed.append(m)
    print(f"== {len(failed)} failures ==")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
