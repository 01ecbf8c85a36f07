#!/usr/bin/env python3
"""Dev-only DuckDB-side timing of the oracle SQL, mimicking the driver's
bench comparison: warm run first, then one timed pass per query with full
materialization. Usage: python3 tools/bench_duck.py <sfDir> <oracle_sql.json>
Prints per-query seconds and the total, for side-by-side comparison with
graft.Bench output."""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    for name, sql in sorted(oracle.items()):  # warm pass
        try:
            con.sql(sql).fetchall()
        except Exception:
            pass
    out = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
        except Exception:
            out[name] = -1.0
            continue
        out[name] = time.time() - t0
    total = sum(v for v in out.values() if v > 0)
    print(json.dumps({"total": total, "queries": out}))


if __name__ == "__main__":
    main()
