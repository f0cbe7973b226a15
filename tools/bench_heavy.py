#!/usr/bin/env python3
"""Work-dominated bench tier: merge the Spark side (bench_heavy_spark.json,
produced by `sbt "runMain graft.BenchHeavy"`) with DuckDB timings of the
SAME oracle SQLs on the SAME 10x parquet, into bench_heavy.json.

Usage: python3 tools/bench_heavy.py [bench_heavy_spark.json]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["documents", "lineitem", "embeddings"]


def main():
    spark_file = sys.argv[1] if len(sys.argv) > 1 else "bench_heavy_spark.json"
    with open(spark_file) as f:
        spark = json.load(f)
    data = spark["data"]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    duck = {}
    for name, sql in spark["oracle_sql"].items():
        # each query reads its own replication tier (x10 pair queries,
        # x100 linear text aggregations) — same files the Spark side read
        d = spark.get("data_for", {}).get(name, data)
        for t in TABLES:
            if os.path.isdir(f"{d}/{t}.parquet"):
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet/*.parquet')")
        best = None
        reps_done = 0
        # SYMMETRIC rep rule with BenchHeavy.scala: best-of-2, plus a
        # third rep for sub-10 s queries (steady-state number; on the
        # Spark side the third rep sheds C2-compilation tax, here it is
        # usually a no-op — symmetry keeps the contract honest)
        while reps_done < 2 or (reps_done < 3 and best < 10.0):
            t0 = time.monotonic()
            # arrow materialization: every output column computed and
            # realized (the Spark side's noop-sink contract) without
            # exploding multi-million-row results into python tuples
            con.execute(sql).fetch_arrow_table()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            reps_done += 1
        duck[name] = round(best, 3)
        print(f"  {name}: duckdb {best:.2f}s vs spark {spark['queries'][name]:.2f}s",
              flush=True)
    # totals compare the SAME query set: a Spark-side failure (-1) drops
    # that query from BOTH sums, otherwise total_ratio silently compares
    # mismatched denominators
    ok = [k for k in duck if spark["queries"].get(k, -1) >= 0]
    out = {
        "metric": "bench_heavy",
        # per-tier replication factors (the flat reps misattributed the
        # x100 queries' per-row cost by 10x); older artifacts carry "reps"
        "replication": spark.get("replication", {"x10": spark.get("reps")}),
        "data": data,
        "loadavg": spark["loadavg"],
        "spark": {k: round(v, 3) for k, v in spark["queries"].items()},
        "duckdb": duck,
        "ratio": {k: round(spark["queries"][k] / duck[k], 2)
                  for k in ok if duck[k] > 0},
        "spark_total": round(sum(spark["queries"][k] for k in ok), 2),
        "duckdb_total": round(sum(duck[k] for k in ok), 2),
    }
    out["total_ratio"] = round(out["spark_total"] / out["duckdb_total"], 2)
    with open("bench_heavy.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
