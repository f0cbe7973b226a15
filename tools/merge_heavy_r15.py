#!/usr/bin/env python3
"""Assemble the round-15 bench_heavy.json: symmetric per-query min-merge.

Spark side: min over this round's full-suite runs (+ filtered partials)
for every query; queries whose CODE changed this round (dd_overlap's
per-operator split, q_bm25's broadcast gates + hash-keyed df join,
q_rrf's LSH vector leg, tx_unigram — all landed after the r14 runs)
draw ONLY from this round's runs; everything else also min-merges the
committed r14 value (code-identical plans, same deterministic tier
content).

DuckDB side: min over this round's passes; q_rrf's oracle was REBUILT
this round (LSH-legged candidate chain) so it draws only from this
round; tx_unigram's x10u oracle DID NOT COMPLETE (>65 min, killed) and
is recorded as a documented waiver entry with the Spark time and a
null ratio.

Usage: merge_heavy_r15.py <out.json> <r14_bench_heavy.json>
         <duck_extra.json> <spark_run.json...>
duck_extra.json: {"name": sec} for this round's duck passes not in the
r14 artifact (parsed from the run logs + duck_rest.json).
"""
import json
import sys

# Spark-side code changed this round: q_rrf (LSH vector leg), tx_unigram
# (bounded seed collect + new tier), q_bm25 (gates + hash df + the
# late-round dl-from-termCounts projection: only runs at or after
# --post-dl count for it). dd_overlap is NOT here: the split default
# was reverted to the session value after the A/B showed no effect, so
# its physical plan is identical to r14's and the r14 min is a valid
# sample of the same computation (the child-session plumbing does not
# change the plan).
CHANGED_SPARK = {"q_bm25", "q_rrf", "tx_unigram"}
POST_DL = {"q_bm25"}  # only runs listed at/after the --post-dl marker
CHANGED_DUCK = {"q_rrf", "q_bm25", "tx_unigram"}  # new/rebuilt oracles/tiers
ORACLE_DNF = {"tx_unigram": "x10u oracle (unigram-EM segmentation SQL) "
              "did not complete in 65 min on this host; killed. Spark side "
              "recorded; no ratio."}


def main():
    out_path, r14_path, duck_extra_path = sys.argv[1], sys.argv[2], sys.argv[3]
    paths = sys.argv[4:]
    post_dl_from = paths.index("--post-dl") if "--post-dl" in paths else None
    if post_dl_from is not None:
        paths = [p for p in paths if p != "--post-dl"]
    runs = [json.load(open(p)) for p in paths]
    post_dl_runs = (runs[post_dl_from:] if post_dl_from is not None else runs)
    r14 = json.load(open(r14_path))
    duck_extra = json.load(open(duck_extra_path))

    # canonical query set + tier map from the first FULL run
    full = next(r for r in runs if len(r["queries"]) > 15)
    names = list(full["queries"].keys())

    spark = {}
    for n in names:
        pool = post_dl_runs if n in POST_DL else runs
        samples = [r["queries"][n] for r in pool
                   if n in r["queries"] and r["queries"][n] >= 0]
        if n not in CHANGED_SPARK and n in r14.get("spark", {}):
            samples.append(r14["spark"][n])
        spark[n] = round(min(samples), 3)

    duck = {}
    for n in names:
        samples = []
        if n in duck_extra:
            samples.append(duck_extra[n])
        if n not in CHANGED_DUCK and n in r14.get("duckdb", {}):
            samples.append(r14["duckdb"][n])
        if samples:
            duck[n] = round(min(samples), 3)

    ok = [n for n in names if n in duck]
    out = {
        "metric": "bench_heavy",
        "replication": full["replication"],
        "data": full["data"],
        "merge": ("r15 symmetric per-query min: Spark over this round's "
                  "full-suite + filtered quiet-gated runs, plus the "
                  "committed r14 min for code-identical queries; DuckDB "
                  "over this round's passes plus the r14 min for "
                  "oracle-identical queries. Changed-this-round (spark: "
                  + ", ".join(sorted(CHANGED_SPARK)) + "; oracle: "
                  + ", ".join(sorted(CHANGED_DUCK)) + ") draw only from "
                  "post-change runs."),
        "loadavg_starts": [r["loadavg"][0] for r in runs],
        "spark": spark,
        "duckdb": duck,
        "ratio": {n: round(spark[n] / duck[n], 2) for n in ok
                  if duck[n] > 0},
        "oracle_dnf": ORACLE_DNF,
        "spark_total": round(sum(spark[n] for n in ok), 2),
        "duckdb_total": round(sum(duck[n] for n in ok), 2),
    }
    out["total_ratio"] = round(out["spark_total"] / out["duckdb_total"], 2)
    json.dump(out, open(out_path, "w"), indent=1)
    for n in sorted(ok, key=lambda n: -out["ratio"].get(n, 0)):
        print(f"{n:22s} spark {spark[n]:8.2f} duck {duck[n]:8.2f} "
              f"ratio {out['ratio'][n]:5.2f}")
    print("TOTAL", out["spark_total"], "vs", out["duckdb_total"],
          "=", out["total_ratio"])


if __name__ == "__main__":
    main()
