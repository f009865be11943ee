#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate (NOT shipped code).

Reads each query result parquet written by `graft.Verify`, runs the
matching oracle SQL in DuckDB over the same testdata tables, sorts
columns by name, and compares values. Usage:

    python3 tools/compare.py [--rtol R] <sfDir> <verifyOutDir> [query ...]

Default is EXACT comparison (the driver-gate semantics at the gate
SFs). `--rtol` is for the self-run SCALE rungs only: double SUMs are
order-dependent, and at sf3 the Spark-vs-DuckDB summation-order
difference reaches 1 ULP on ~6e10 aggregates (rel err ~1e-16), which
exact compare reports as a mismatch. A tight rtol (1e-12) keeps every
real bug visible while absorbing non-associativity; it applies only to
float columns — everything else stays exact.
"""
import sys, json, glob, os
import numpy as np
import duckdb
import pandas as pd

def main():
    argv = sys.argv[1:]
    rtol = 0.0
    if argv and argv[0] == "--rtol":
        rtol = float(argv[1]); argv = argv[2:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            duck_df = con.execute(oracle[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: {ex}"); n_fail += 1; continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        mismatch = None
        for c in s.columns:
            sv, dv = s[c], d[c]
            if str(sv.dtype) != str(dv.dtype):
                mismatch = f"dtype[{c}] {sv.dtype} vs {dv.dtype}"; break
            if rtol and str(sv.dtype).startswith("float"):
                a = sv.reset_index(drop=True).to_numpy()
                b = dv.reset_index(drop=True).to_numpy()
                if not np.allclose(a, b, rtol=rtol, atol=0.0, equal_nan=True):
                    bad = ~np.isclose(a, b, rtol=rtol, atol=0.0, equal_nan=True)
                    i = int(np.argmax(bad))
                    mismatch = f"value[{c}] row {i}: {a[i]!r} vs {b[i]!r} (rtol={rtol})"
                    break
                continue
            if not sv.reset_index(drop=True).equals(dv.reset_index(drop=True)):
                neq = (sv.reset_index(drop=True) != dv.reset_index(drop=True))
                try:
                    i = int(neq[neq].index[0])
                    mismatch = f"value[{c}] row {i}: {sv.iloc[i]!r} vs {dv.iloc[i]!r}"
                except Exception:
                    mismatch = f"value[{c}]"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); n_fail += 1
        else:
            print(f"ok   {name} ({len(s)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
