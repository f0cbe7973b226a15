#!/usr/bin/env python3
"""Driver-shaped correctness GATE artifact over a check.py-style compare.

Usage: python3 tools/gate.py <sfDir> <verifyOutDir> <artifact.json>

Same compare as tools/check.py (schema / row count / exact values on
name-sorted columns and sorted rows), but emits the driver's
CORRECTNESS-style JSON artifact — per-query {err, hash_match, rows,
rows_match, schema_match} plus n_pass/n_fail — so higher-SF gates
(CORRECTNESS_SF03.json, CORRECTNESS_SF10.json) are reproducible from
one committed tool instead of an ad-hoc transcript. DUCKDB_THREADS
caps the oracle side (pair-heavy oracles at 10x want a bound).
"""
import json
import os
import sys

import duckdb
import pandas as pd

from check import TABLES, norm


def main():
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads TO {int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    queries = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        rec = {"err": None, "hash_match": False, "rows": 0,
               "rows_match": False, "schema_match": False}
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(sql).df()
            g, e = norm(got), norm(exp)
            rec["rows"] = len(g)
            rec["schema_match"] = list(g.columns) == list(e.columns)
            rec["rows_match"] = len(g) == len(e)
            rec["hash_match"] = (rec["schema_match"] and rec["rows_match"]
                                 and g.astype(str).equals(e.astype(str)))
        except Exception as ex:
            rec["err"] = str(ex)[:400]
        ok = rec["err"] is None and rec["hash_match"]
        n_pass += ok
        n_fail += not ok
        print(("PASS" if ok else "FAIL"), name, rec["rows"], flush=True)
        queries[name] = rec
    out = {"n_fail": n_fail, "n_pass": n_pass, "queries": queries}
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail -> {artifact}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
