#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from outDir/oracle_sql.json in DuckDB over the sfDir parquet tables and
compare (rows, schema, values) against the Spark parquet dumps.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd


def float_bits(s):
    """Canonical bit pattern of a float column: all NaNs collapse to the
    one quiet-NaN pattern, but -0.0 and +0.0 stay DISTINCT — the driver
    hashes raw values, so a signed-zero mismatch is a real FAIL there
    and must be one here too (r8 lesson: pandas `==` is signed-zero-
    blind and let q_embed_cov ship red)."""
    arr = s.to_numpy(dtype="float64", na_value=np.nan).copy()
    arr[np.isnan(arr)] = np.nan
    return arr.view(np.int64)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.read_parquet(os.path.join(out_dir, name))
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing values
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        gs = got.sort_values(by=list(got.columns), kind="mergesort").reset_index(drop=True)
        ws = want.sort_values(by=list(want.columns), kind="mergesort").reset_index(drop=True)
        mismatch = None
        for c in gs.columns:
            a, b = gs[c], ws[c]
            try:
                if a.dtype.kind == "f" and b.dtype.kind == "f":
                    # exact bit compare (post NaN-canonicalization):
                    # reproduces the driver's value hash, including the
                    # ±0.0 distinction that plain == misses
                    eq = pd.Series(float_bits(a) == float_bits(b))
                else:
                    eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = eq.idxmin()
                mismatch = (c, i, a[i], b[i], a.dtype, b.dtype)
                break
            if str(a.dtype) != str(b.dtype):
                mismatch = (c, -1, None, None, a.dtype, b.dtype)
                break
        if mismatch:
            c, i, av, bv, at, bt = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={av!r}({at}) duckdb={bv!r}({bt})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    extra = [q for q in os.listdir(out_dir)
             if os.path.isdir(os.path.join(out_dir, q)) and q not in oracle]
    for q in sorted(extra):
        n = len(pd.read_parquet(os.path.join(out_dir, q)))
        print(f"ROWS {q}: {n} rows (no oracle)")
    print(f"== {n_pass} pass, {n_fail} fail, {len(extra)} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
