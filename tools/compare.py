#!/usr/bin/env python3
"""Driver-style correctness check: Spark parquet dumps vs DuckDB oracle.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Mimics the driver's CORRECTNESS gate: for each query in
oracle_sql.json, load the Spark result parquet, run the oracle SQL in
DuckDB over views of the same test tables, sort columns by name, sort
rows, and compare values exactly (floats via repr equality).
"""
import json
import math
import sys

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def frame(rel):
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    dtypes = {c: str(df[c].dtype) for c in cols}
    return cols, dtypes, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            got = frame(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = frame(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gd, gr = got
        wc, wd, wr = want
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        if gd != wd:
            print(f"WARN {name}: dtypes {gd} != {wd}")
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(gr, wr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first: {bad[0]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
