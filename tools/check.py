#!/usr/bin/env python3
"""Dev-only pre-validation of SparkEntry queries against the DuckDB oracle.

Mimics the driver's t2 gate: run Verify's parquet dumps + oracle_sql.json
through DuckDB on the same test tables, sort columns by name, sort rows,
compare values. Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last",
                            ignore_index=True, kind="mergesort")
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return str(list(a)) == str(list(b))
    return a == b or str(a) == str(b)


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = norm(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if want.shape != got.shape:
            print(f"FAIL {name}: shape want={want.shape} got={got.shape}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(want)):
            for c in want.columns:
                if not cell_eq(want.at[i, c], got.at[i, c]):
                    bad = (i, c, want.at[i, c], got.at[i, c])
                    break
            if bad:
                break
        dt_mismatch = [
            (c, str(want[c].dtype), str(got[c].dtype))
            for c in want.columns if str(want[c].dtype) != str(got[c].dtype)]
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: want={bad[2]!r} got={bad[3]!r}")
            n_fail += 1
        else:
            note = f" [dtype diff: {dt_mismatch}]" if dt_mismatch else ""
            print(f"PASS {name} ({len(want)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
