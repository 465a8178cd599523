#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, loads the Spark-side result parquet from
<verifyOutDir>/<name>/, sorts columns by name (like the driver), sorts rows,
and compares values exactly. Exit code 1 on any mismatch.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order for comparison only
    key_cols = [c for c in df.columns]
    try:
        df = df.sort_values(by=key_cols, kind="mergesort").reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"row counts differ: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
        else:
            try:
                ok = av.equals(bv) or (av.astype(object) == bv.astype(object)).all()
            except Exception:
                ok = False
        if not ok:
            mism = None
            try:
                neq = ~(((av.isna()) & (bv.isna())) | (av.astype(object) == bv.astype(object)))
                idx = neq[neq].index[:3]
                mism = [(i, av[i], bv[i]) for i in idx]
            except Exception:
                pass
            return f"column '{c}' values differ (dtype spark={av.dtype} duck={bv.dtype}): {mism}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet in {res_dir}")
            failures += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle checks passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
