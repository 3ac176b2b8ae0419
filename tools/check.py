#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/ :
  - run the matching oracle SQL from oracle_sql.json in DuckDB with the
    sf tables registered as views
  - sort columns by name, sort rows, compare cell-exact
Reports per-query PASS/FAIL with first-diff detail.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    """Return (colnames_sorted, rows_sorted) for a duckdb relation SQL."""
    rel = con.sql(rel_sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    proj = [tuple(r[i] for i in order) for r in rows]
    proj.sort(key=lambda row: tuple((x is not None, str(type(x)), str(x)) for x in row))
    return [cols[i] for i in order], proj


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    only = set(sys.argv[3:])
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            results[name] = "MISSING-RESULT"
            continue
        try:
            got_cols, got = canon(con, f"SELECT * FROM '{res_dir}/*.parquet'")
            want_cols, want = canon(con, oracle[name])
        except Exception as e:  # noqa: BLE001
            results[name] = f"ERROR: {e}"
            continue
        # The DRIVER's compare sorts with pandas, which cannot hash/sort
        # list or struct cells — any non-scalar output column passes
        # locally but fails the real gate. Reject it here.
        nonscalar = None
        for r in got[:5] + want[:5]:
            for i, x in enumerate(r):
                if isinstance(x, (list, tuple, dict)):
                    nonscalar = got_cols[i] if i < len(got_cols) else f"#{i}"
                    break
            if nonscalar:
                break
        if nonscalar:
            results[name] = f"NONSCALAR-OUTPUT col={nonscalar} (driver gate would crash)"
            continue
        if got_cols != want_cols:
            results[name] = f"SCHEMA-MISMATCH got={got_cols} want={want_cols}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWCOUNT got={len(got)} want={len(want)}"
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got, want)):
            if not all(cells_equal(x, y) for x, y in zip(g, w)):
                bad = (i, g, w)
                break
        results[name] = "PASS" if bad is None else \
            f"VALUE-MISMATCH row={bad[0]} got={bad[1]} want={bad[2]}"
    npass = sum(1 for v in results.values() if v == "PASS")
    for name, v in results.items():
        flag = "PASS" if v == "PASS" else "FAIL"
        print(f"[{flag}] {name}" + ("" if v == "PASS" else f" :: {v[:400]}"))
    print(f"\n{npass}/{len(results)} PASS")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
