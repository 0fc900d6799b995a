#!/usr/bin/env python3
"""Full-precision Spark-vs-DuckDB diff for hash-failing queries.

Local debugging aid only (mirrors the driver's correctness gate):
  python3 tools/forensics.py <sfDir> <verifyOut> q_m6_cv q_m14_anova ...

Reads <verifyOut>/<q>/*.parquet (Spark result) and oracle_sql.json,
runs the oracle in DuckDB over <sfDir>'s tables, sorts columns by name
and rows by all columns, then reports the first diverging cell with
full float repr + hex.
"""
import json
import struct
import sys

import duckdb


def hexf(v):
    if isinstance(v, float):
        return struct.pack(">d", v).hex()
    return ""


def main():
    sf_dir, vout = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
        except duckdb.Error:
            pass
    for q in queries:
        if q not in oracle:
            print(f"== {q}: NO ORACLE SQL ==")
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{vout}/{q}/*.parquet')").fetchdf()
        duck_df = con.execute(oracle[q]).fetchdf()
        scols = sorted(spark_df.columns)
        dcols = sorted(duck_df.columns)
        if scols != dcols:
            print(f"== {q}: SCHEMA DIFF spark={scols} duck={dcols} ==")
            continue
        s = spark_df[scols].sort_values(scols).reset_index(drop=True)
        d = duck_df[dcols].sort_values(dcols).reset_index(drop=True)
        if len(s) != len(d):
            print(f"== {q}: ROWCOUNT spark={len(s)} duck={len(d)} ==")
            continue
        ndiff = 0
        for i in range(len(s)):
            for c in scols:
                a, b = s[c].iloc[i], d[c].iloc[i]
                try:
                    same = (a == b) or (a != a and b != b)
                except (TypeError, ValueError):
                    same = str(a) == str(b)
                if not same:
                    if ndiff < 8:
                        print(f"  {q} row {i} col {c}:")
                        print(f"    spark={a!r} {hexf(a)}")
                        print(f"    duck ={b!r} {hexf(b)}")
                    ndiff += 1
        print(f"== {q}: {'OK' if ndiff == 0 else f'{ndiff} diffs'} "
              f"({len(s)} rows) ==")


if __name__ == "__main__":
    main()
