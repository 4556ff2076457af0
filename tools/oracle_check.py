#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For every query dir under <verifyOutDir>: read Spark's parquet result, run
the matching oracle SQL (oracle_sql.json) in DuckDB over views of the
<sfDir> parquet tables, sort columns by name, and compare row count,
schema (column names), and cell values in row order.
"""
import json, sys, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        spark_df = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
        duck_df = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: schema {list(spark_df.columns)} vs "
                  f"{list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        mismatch = None
        for c in spark_df.columns:
            a = [norm(v) for v in spark_df[c].tolist()]
            b = [norm(v) for v in duck_df[c].tolist()]
            if a != b:
                i = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
                mismatch = (c, i, a[i], b[i])
                break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={x} duck={y}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
