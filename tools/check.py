#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf tables, and
compares: row count, column names, and cell values (sorted rows, columns
sorted by name — mirroring the driver's hash compare).

Mirrors two dtype hazards of the driver's pandas-based compare that a plain
fetchall() repr-compare cannot see:
  * numeric-kind mismatch — DuckDB HUGEINT (e.g. sum of integer literals)
    becomes float64/object in pandas while Spark writes int64;
  * unhashable cells — an ARRAY output column materializes as numpy.ndarray
    and crashes the driver's sort/hash.
Both sides are therefore loaded through pandas, like the driver does.
"""
import json
import math
import sys

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, (np.ndarray, list, dict)):
        raise TypeError(f"unhashable cell type {type(v).__name__} "
                        "(driver's pandas compare would crash)")
    # Every return is a (tag, str) tuple so sorted() never compares
    # mixed types (e.g. a NULL cell against a float cell).
    if v is None:
        return ("n", "")
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return ("f", "NaN")
        # mirror a hash-compare: exact repr (queries must round themselves)
        return ("f", repr(float(v)))
    if isinstance(v, (bool, np.bool_)):
        return ("b", repr(bool(v)))
    if isinstance(v, (int, np.integer)):
        return ("i", repr(int(v)))
    return ("s", repr(v))


def kind(dtype):
    k = dtype.kind
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "ts", "O": "obj"}.get(k, k)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != "
                  f"{sorted(exp.columns)}")
            n_fail += 1
            continue
        dtype_bad = False
        for c in got.columns:
            gk, ek = kind(got[c].dtype), kind(exp[c].dtype)
            if gk != ek:
                print(f"FAIL {name}: column {c} dtype kind {gk} != {ek} "
                      f"({got[c].dtype} vs {exp[c].dtype}) — pandas hash "
                      "would mismatch")
                dtype_bad = True
        if dtype_bad:
            n_fail += 1
            continue
        cols = sorted(got.columns)
        try:
            gs = sorted(tuple(norm_cell(v) for v in row)
                        for row in got[cols].itertuples(index=False))
            es = sorted(tuple(norm_cell(v) for v in row)
                        for row in exp[cols].itertuples(index=False))
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
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
