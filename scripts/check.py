#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py /tmp/vout /root/testdata/sf0.01

For each query dumped by graft.Verify: load the Spark parquet result, run the
oracle SQL in DuckDB over the same tables, sort columns by name and rows by
all columns, then compare cell-by-cell (exact for non-floats; tiny relative
tolerance reported separately for floats so we can see near-misses).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True, True
    if (a is None) != (b is None):
        return False, False
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True, True
            exact = fa == fb
            tol = exact or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
            return exact, tol
    except (TypeError, ValueError):
        pass
    eq = str(a) == str(b)
    return eq, eq


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_tol = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}")
            n_fail += 1
            continue
        exact_all, tol_all, first_bad = True, True, None
        for col in got.columns:
            for i, (a, b) in enumerate(zip(got[col], exp[col])):
                a = None if (a is None or (isinstance(a, float) and math.isnan(a))) else a
                b = None if (b is None or (isinstance(b, float) and math.isnan(b))) else b
                ex, tl = cell_eq(a, b)
                exact_all &= ex
                tol_all &= tl
                if not tl and first_bad is None:
                    first_bad = (col, i, a, b)
        if exact_all:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        elif tol_all:
            print(f"TOL  {name}: float-only diff within 1e-9 (driver hash may still fail!)")
            n_tol += 1
        else:
            c, i, a, b = first_bad
            print(f"FAIL {name}: first diff col={c} row={i}: spark={a!r} oracle={b!r}")
            n_fail += 1
    print(f"\n{n_pass} exact, {n_tol} tolerance-only, {n_fail} fail")
    sys.exit(1 if (n_fail or n_tol) else 0)


if __name__ == "__main__":
    main()
