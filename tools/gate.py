#!/usr/bin/env python3
"""Driver-shaped correctness GATE artifact over a check.py-style compare.

Usage:
  python3 tools/gate.py <sfDir> <verifyOutDir> <artifact.json> \
      [--pin <sfDir2> <verifyOutDir2> <q1,q2,...>] [--only <q1,q2,...>]

Same compare as tools/check.py (schema / row count / exact values on
name-sorted columns and sorted rows), but emits the driver's
CORRECTNESS-style JSON artifact — per-query {err, hash_match, rows,
rows_match, schema_match, sf} plus n_pass/n_fail — so higher-SF gates
(CORRECTNESS_SF03.json, CORRECTNESS_SF10.json) are reproducible from
one committed tool instead of an ad-hoc transcript.

--pin routes the listed queries to a SECOND (sfDir, verifyOutDir)
pair: the max-SF gate verifies every linear-oracle query at the
primary SF and pins the pair-machinery queries (whose DuckDB oracles
are superlinear — e.g. dd_ngram_jaccard's uncapped pair join hit 84 GB
RSS at sf1.0 while the Spark side finished the whole surface) at
their max ORACLE-feasible SF. Each query's record carries the sf
directory it was verified against, so the artifact is explicit about
per-query coverage. DUCKDB_THREADS caps the oracle side;
DUCKDB_MEMLIMIT (e.g. "48GB") turns an oracle blow-up into a
per-query err instead of an OOM-killed gate.
"""
import json
import os
import sys

import duckdb
import pandas as pd

from check import TABLES, norm


def connect(sf_dir):
    con = duckdb.connect()
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads TO {int(threads)}")
    memlimit = os.environ.get("DUCKDB_MEMLIMIT")
    if memlimit:
        con.execute(f"SET memory_limit = '{memlimit}'")
    # DUCKDB_TEMPDIR: with a memory_limit set, larger-than-memory
    # operators (the pair-join oracles that pinned 8 queries at sf0.5)
    # spill here instead of erroring/OOMing — the max-SF push lever
    tmpdir = os.environ.get("DUCKDB_TEMPDIR")
    if tmpdir:
        con.execute(f"SET temp_directory = '{tmpdir}'")
        con.execute("SET preserve_insertion_order = false")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main():
    args = sys.argv[1:]
    pin_sf = pin_out = None
    pinned = set()
    if "--pin" in args:
        i = args.index("--pin")
        pin_sf, pin_out = args[i + 1], args[i + 2]
        pinned = set(args[i + 3].split(","))
        args = args[:i] + args[i + 4:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    # --merge-base <artifact>: seed records from a prior gate run; the
    # queries compared in THIS run overwrite their seeded records. The
    # two-phase max-SF flow stays one reproducible tool: phase 1 runs
    # the full surface at the max SF (oracle blow-ups become per-query
    # errs under DUCKDB_MEMLIMIT), phase 2 re-runs just those queries
    # --pin'ned at their max oracle-feasible SF with --merge-base
    # pointing at phase 1's artifact.
    merge_base = {}
    if "--merge-base" in args:
        i = args.index("--merge-base")
        merge_base = json.load(open(args[i + 1]))["queries"]
        args = args[:i] + args[i + 2:]
    sf_dir, out_dir, artifact = args[0], args[1], args[2]
    con = connect(sf_dir)
    con_pin = connect(pin_sf) if pin_sf else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # seed only keys still present in the CURRENT surface: a removed or
    # renamed query must not keep its stale PASS record and inflate
    # n_pass in the merged artifact
    queries = {k: v for k, v in merge_base.items() if k in oracles}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only is not None and name not in only:
            continue
        use_pin = name in pinned
        q_sf, q_out, q_con = (
            (pin_sf, pin_out, con_pin) if use_pin else (sf_dir, out_dir, con))
        rec = {"err": None, "hash_match": False, "rows": 0,
               "rows_match": False, "schema_match": False,
               "sf": os.path.basename(q_sf.rstrip("/"))}
        try:
            got = pd.read_parquet(f"{q_out}/{name}")
            exp = q_con.execute(sql).df()
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
        print(("PASS" if ok else "FAIL"), name, rec["rows"], rec["sf"],
              flush=True)
        queries[name] = rec
    # recount over the merged map so --merge-base seeds are included
    n_pass = sum(1 for r in queries.values()
                 if r["err"] is None and r["hash_match"])
    n_fail = len(queries) - n_pass
    out = {"n_fail": n_fail, "n_pass": n_pass, "queries": queries}
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass, {n_fail} fail -> {artifact}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
