#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet result with an entry in
oracle_sql.json, runs the oracle SQL in DuckDB against the parquet tables
in <sfDir>, then compares: column names (sorted), dtypes (loose), row
count, and cell values after sorting columns by name and rows by all
columns. Prints a per-query PASS/FAIL line and a summary.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


STRICT = True  # driver hashes values: require exact equality, even floats


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        if STRICT:
            return af == bf
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = None
        for col in got.columns:
            ga, wa = got[col].tolist(), want[col].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if not cells_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        # dtype drift report (schema check is part of the driver gate)
        dt = [(c, str(got[c].dtype), str(want[c].dtype))
              for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if bad:
            col, i, x, y = bad
            print(f"FAIL {name}: value mismatch col={col} row={i}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            note = f"  [dtype drift: {dt}]" if dt else ""
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracles")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
