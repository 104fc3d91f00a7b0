#!/usr/bin/env python
"""Spot-check declared queries against their DuckDB oracles at a given
SF dir (default sf0.01 — the driver's gate scale). Mirrors
tests/test_driver_contract.py's row/column/value comparison, runnable
for a subset:

    python scripts/oracle_check.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from yamlpyowl_spark.plans.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = args or sorted(queries)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="ypo-oracle-check")
    rc = 0
    for name in names:
        df = queries[name](spark, sf_dir)
        s_cols = [c.lower() for c in df.columns]
        s_rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            print(f"{name}: NO ORACLE ({len(s_rows)} rows)")
            continue
        d_tbl = con.execute(oracles[name]).arrow()
        d_cols = [c.lower() for c in d_tbl.column_names]
        d_rows = [tuple(r.values()) for r in d_tbl.to_pylist()]
        if sorted(s_cols) != sorted(d_cols):
            print(f"{name}: FAIL columns {s_cols} vs {d_cols}")
            rc = 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"{name}: FAIL rows {len(s_rows)} vs {len(d_rows)}")
            rc = 1
            continue
        sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"{name}: FAIL values, first diffs: {diff}")
            rc = 1
            continue
        print(f"{name}: OK ({len(s_rows)} rows)")
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
