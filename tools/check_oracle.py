#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev loop only; the
engine itself has no Python dependency).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sfDir parquet tables,
loads the corresponding Spark parquet output, sorts columns by name, and
compares row count, column names/types, and cell values exactly.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr => bit-exact compare
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = Path(out_dir) / name
        try:
            duck = con.execute(sql)
            d_cols = [c[0] for c in duck.description]
            d_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            n_fail += 1
            continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            s_cols = [c[0] for c in sp.description]
            s_rows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if sorted(d_cols) != sorted(s_cols):
            print(f"FAIL {name}: columns differ duck={sorted(d_cols)} spark={sorted(s_cols)}")
            n_fail += 1
            continue
        if len(d_rows) != len(s_rows):
            print(f"FAIL {name}: rowcount duck={len(d_rows)} spark={len(s_rows)}")
            n_fail += 1
            continue
        dk, sk = table_key(d_rows, d_cols), table_key(s_rows, s_cols)
        if dk != sk:
            bad = next(i for i in range(len(dk)) if dk[i] != sk[i])
            print(f"FAIL {name}: first value mismatch at row {bad}:")
            print(f"  duck : {dk[bad]}")
            print(f"  spark: {sk[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(d_rows)} rows)")
        n_pass += 1
    # rows-only queries (no oracle): just report row counts
    for child in sorted(Path(out_dir).iterdir()):
        if child.is_dir() and child.name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{child}/*.parquet')").fetchone()[0]
            print(f"ROWS {child.name}: {n}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
