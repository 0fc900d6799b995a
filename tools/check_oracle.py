#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the sf
dir's parquet files registered as views, and compares against the Spark
parquet dump <verifyOutDir>/<name>/. Reports per-query schema/row/value
match. NOT part of the library — dev tooling only (mirrors driver-side
checks; uses driver-side deps duckdb/pandas deliberately).
"""
import json
import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cmp_frames(spark_df, duck_df, tol=1e-9):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"COLS spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    bad = []
    for col in a.columns:
        av, bv = a[col], b[col]
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            if xn and yn:
                continue
            if xn != yn:
                bad.append(f"{col}[{i}]: {x!r} vs {y!r}")
            elif isinstance(x, float) or isinstance(y, float):
                if not math.isclose(float(x), float(y), rel_tol=tol, abs_tol=tol):
                    bad.append(f"{col}[{i}]: {x!r} vs {y!r}")
            elif str(x) != str(y):
                bad.append(f"{col}[{i}]: {x!r} vs {y!r}")
            if len(bad) >= 5:
                return "VALS " + "; ".join(bad)
    return "VALS " + "; ".join(bad) if bad else None


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    timings = []  # (seconds, name) — surfaces the oracles worth cheapening
    import os
    only_present = bool(os.environ.get("ORACLE_ONLY_PRESENT"))
    for name, sql in sorted(oracle.items()):
        pq = Path(out_dir) / name
        if only_present and not pq.exists():
            continue  # focused Verify run: compare only the dumped subset
        t0 = time.monotonic()
        try:
            spark_df = pd.read_parquet(pq)
            duck_df = con.sql(sql).df()
            err = cmp_frames(spark_df, duck_df)
        except Exception as e:  # noqa: BLE001
            err = f"ERR {type(e).__name__}: {e}"
        timings.append((time.monotonic() - t0, name))
        if err:
            n_bad += 1
            print(f"FAIL {name}: {err[:400]}")
        else:
            n_ok += 1
            # the driver hash-compares VALUES incl. their width (r1: DuckDB
            # HUGEINT vs Spark BIGINT hashed differently with equal values)
            # — surface dtype divergence the tol-compare can't see
            dt = [f"{c}: {spark_df[c].dtype} vs {duck_df[c].dtype}"
                  for c in spark_df.columns
                  if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
            print(f"ok   {name}" + (f"  [DTYPE {'; '.join(dt)}]" if dt else ""))
    # queries without oracles: just check rows exist
    for d in sorted(Path(out_dir).iterdir()):
        if d.name in ("aux", "_aux"):
            continue
        if d.is_dir() and d.name not in oracle:
            n = len(pd.read_parquet(d))
            print(f"rows {d.name}: {n}{'' if n > 0 else '  <-- EMPTY'}")
    print(f"\n{n_ok} ok, {n_bad} fail, "
          f"compare wall {sum(t for t, _ in timings):.1f}s")
    for t, name in sorted(timings, reverse=True)[:15]:
        print(f"  slow {t:6.2f}s  {name}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
