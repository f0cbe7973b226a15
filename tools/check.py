#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the raw
tables in <sfDir>, and compares: schema (column names), row count, and
values (sorted columns by name, rows sorted, exact match after
normalization).
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        try:
            import numpy as np
            if df[c].dtype.kind in "mM":
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        except Exception:
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads TO {int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(sql).df()
            g, e = norm(got), norm(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
                n_fail += 1
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
                n_fail += 1
                continue
            # exact compare, with a float fallback report
            eq = g.astype(str).equals(e.astype(str))
            if eq:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
            else:
                diff = (g.astype(str) != e.astype(str))
                cells = diff.to_numpy().sum()
                print(f"FAIL {name}: {cells} differing cells")
                mask = diff.any(axis=1)
                print("  spark:", g[mask].head(3).to_dict("records"))
                print("  duck :", e[mask].head(3).to_dict("records"))
                n_fail += 1
        except Exception as ex:
            print(f"ERROR {name}: {ex}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
