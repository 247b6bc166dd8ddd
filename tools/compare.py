#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (SURVEY §3.4).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against views
over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name on both sides, and compares
values row by row (exact equality — same bar as a hash match).
"""
import json
import sys
import glob
import math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in skip:
            continue
        sql = oracle[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetchall()
            duck_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark = rel.fetchall()
            spark_cols = [d[0] for d in rel.description]
        except Exception as e:
            print(f"FAIL {name}: spark parquet read error: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(duck_cols) != sorted(spark_cols):
            print(f"FAIL {name}: columns differ duck={sorted(duck_cols)} "
                  f"spark={sorted(spark_cols)}")
            n_fail += 1
            continue
        if len(duck) != len(spark):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
            n_fail += 1
            continue
        # sort columns by name (driver semantics), keep row order
        dperm = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        sperm = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        bad = None
        for r, (dr, sr) in enumerate(zip(duck, spark)):
            dv = tuple(norm(dr[i]) for i in dperm)
            sv = tuple(norm(sr[i]) for i in sperm)
            if dv != sv:
                bad = (r, dv, sv)
                break
        if bad:
            r, dv, sv = bad
            print(f"FAIL {name}: row {r} differs\n  duck = {dv}\n  spark= {sv}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(duck)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracle)} oracled")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()))
