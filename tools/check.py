#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf tables, and
compares: row count, column names, and cell values (sorted rows, columns
sorted by name — mirroring the driver's hash compare).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # mirror a hash-compare: exact repr (queries must round themselves)
        return repr(v)
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
            exp_rel = con.sql(sql)
            exp = exp_rel.fetchall()
            exp_cols = [d[0] for d in exp_rel.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # reorder columns by sorted name, then sort rows
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        eperm = [exp_cols.index(c) for c in sorted(exp_cols)]
        gs = sorted(tuple(norm_cell(r[i]) for i in gperm) for r in got)
        es = sorted(tuple(norm_cell(r[i]) for i in eperm) for r in exp)
        if len(gs) != len(es):
            print(f"FAIL {name}: rows {len(gs)} != {len(es)}")
            n_fail += 1
            continue
        if gs != es:
            bad = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gs)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
