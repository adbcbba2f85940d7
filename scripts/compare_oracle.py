#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [name ...]

Loads each <verifyOutDir>/<name> parquet (Spark side), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
tables, and compares rows / column names / sorted values. Exit 1 on any
mismatch. Driver-side python (duckdb, pyarrow) — NOT part of the Scala
library.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        out.append(tuple("\\N" if v is None else str(v) for v in r))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not names:
        names = sorted(oracle)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    failed = []
    for name in names:
        if name not in oracle:
            print(f"{name}: NO ORACLE (rows-only query)")
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            ora_rel = con.execute(oracle[name])
            ora_cols = [d[0] for d in ora_rel.description]
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            failed.append(name)
            continue
        # the driver sorts columns by name before hashing values
        s_ix = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        o_ix = sorted(range(len(ora_cols)), key=lambda i: ora_cols[i])
        ok_schema = sorted(spark_cols) == sorted(ora_cols)
        s_vals = canon([[r[i] for i in s_ix] for r in spark_rows])
        o_vals = canon([[r[i] for i in o_ix] for r in ora_rows])
        ok_rows = len(spark_rows) == len(ora_rows)
        ok_hash = s_vals == o_vals
        status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
        print(f"{name}: {status} rows={len(spark_rows)}/{len(ora_rows)} "
              f"schema={ok_schema} hash={ok_hash}")
        if status == "FAIL":
            failed.append(name)
            if not ok_schema:
                print(f"  spark cols: {sorted(spark_cols)}")
                print(f"  ora   cols: {sorted(ora_cols)}")
            for a, b in zip(s_vals, o_vals):
                if a != b:
                    print(f"  first diff:\n    spark={a}\n    ora  ={b}")
                    break
    if failed:
        print("FAILED:", ",".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
