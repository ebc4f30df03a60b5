#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sfDir
parquet tables, sorts columns by name, and compares row-by-row.

The comparison is TYPE-SENSITIVE, like the driver's value hash: a DuckDB
HUGEINT (un-cast integer sum()) differs from Spark's BIGINT even when the
numeric values match. Run against sf0.1 (the driver's scale), not sf0.01.
"""
import json
import math
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_of(res):
    cols = list(res.columns)
    types = [str(t) for t in res.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = res.fetchall()
    return ([cols[i] for i in order], [types[i] for i in order],
            [tuple(norm(r[i]) for i in order) for r in data])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify writes the set of query names it attempted; a missing output
    # dir for an ATTEMPTED query means the query crashed — count it as
    # FAIL instead of silently skipping (only unattempted/filtered queries
    # are skipped).
    attempted_path = f"{out_dir}/attempted.json"
    attempted = set(json.load(open(attempted_path))) if os.path.exists(
        attempted_path) else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if attempted is not None and name in attempted:
                print(f"FAIL {name}: attempted but no output (query crashed)")
                n_fail += 1
            continue  # filtered Verify run — only compare what was dumped
        try:
            scols, stypes, srows = rows_of(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            ocols, otypes, orows = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if stypes != otypes:
            diff = [(c, a, b) for c, a, b in zip(scols, stypes, otypes) if a != b]
            print(f"FAIL {name}: column TYPES differ (driver hash is typed): {diff}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"  cols  : {scols}")
            print(f"  spark : {a}")
            print(f"  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
