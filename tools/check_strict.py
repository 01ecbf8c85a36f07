#!/usr/bin/env python3
"""Dev-only BIT-STRICT pre-validation of SparkEntry queries vs the oracle.

Same shape as check.py but mirrors the driver's hash gate instead of the
value gate: floats must be bit-identical (so +0.0 vs -0.0 FAILS here even
though 0.0 == -0.0), NaN == NaN by bit pattern. Catches signed-zero /
last-ulp divergences before the driver does.
Usage: python3 tools/check_strict.py <sfDir> <outDir> [only1,only2,...]
"""
import json
import math
import struct
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


def bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            # NaN payloads: both engines emit the quiet NaN; accept any NaN
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
        return bits(fa) == bits(fb)  # bit-strict: -0.0 != +0.0
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        if len(la) != len(lb):
            return False
        return all(cell_eq(x, y) for x, y in zip(la, lb))
    return a == b or str(a) == str(b)


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
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
            print(f"FAIL {name}: columns want={list(want.columns)} "
                  f"got={list(got.columns)}")
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
        if bad:
            extra = ""
            try:
                extra = (f" bits want={bits(float(bad[2])):#x}"
                         f" got={bits(float(bad[3])):#x}")
            except (TypeError, ValueError):
                pass
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"want={bad[2]!r} got={bad[3]!r}{extra}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed (bit-strict)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
