#!/usr/bin/env python3
"""Fold load-gated wall-bench runs into the committed min-merge artifacts.

Usage: python3 tools/merge_bench.py <out.json> <baseline.json> <run.json...>

This host's phantom kernel-load waves inflate random query subsets of
any single run 1.2-2x, so a committed artifact must be the PER-QUERY
MIN over several runs (each run is itself best-of-2 per query, so a
min never hides work — every sample is a complete execution). Queries
whose code/semantics changed mid-round must only draw from runs that
include the change: list them in --changed-since, and mark where the
change landed with --from <runIndex> (1-based position in the file
list; all runs at or after it count). Without --from, only the FINAL
run counts for changed queries.

  merge_bench.py out.json base.json --changed-since q1 q2 --from 3 -- r1.json r2.json r3.json r4.json

Writes <out.json> (bench_out-shaped: total + per-query) and
<baseline.json> ({"queries":{...}} — the noise-guard reference, which
per Bench.scala policy only a quiet-start run may raise).
"""
import json
import sys


def main():
    args = sys.argv[1:]
    changed = []
    changed_from = None  # 1-based index of the first run with the change
    if "--changed-since" in args:
        i = args.index("--changed-since")
        # queries listed after the flag, optional '--from N', then '--', then files
        j = args.index("--", i)
        seg = args[i + 1:j]
        if "--from" in seg:
            f = seg.index("--from")
            changed_from = int(seg[f + 1])
            seg = seg[:f] + seg[f + 2:]
        changed = seg
        args = args[:i] + args[j + 1:]
    out_file, base_file = args[0], args[1]
    runs = [json.load(open(f)) for f in args[2:]]
    merged = {}
    meta = []
    for idx, r in enumerate(runs):
        meta.append({"loadavg": r.get("loadavg"), "value": round(r.get("value", -1), 1),
                     "n": len(r.get("queries", {}))})
        # changed queries draw from runs that include the change: all
        # runs at/after --from when given, else only the final run
        has_change = (idx >= changed_from - 1) if changed_from is not None \
            else idx == len(runs) - 1
        for k, v in r["queries"].items():
            if v < 0:
                continue
            if k in changed and not has_change:
                continue
            merged[k] = min(merged.get(k, v), v)
    total = round(sum(merged.values()), 3)
    out = {"metric": "total", "value": total, "unit": "sec",
           "merge": f"per-query min of {len(runs)} load-gated runs",
           "runs": meta,
           "changed_queries": changed, "changed_from_run": changed_from,
           "queries": {k: merged[k] for k in sorted(merged)}}
    with open(out_file, "w") as f:
        json.dump(out, f, indent=1)
    with open(base_file, "w") as f:
        json.dump({"queries": {k: merged[k] for k in sorted(merged)}}, f)
    print(f"{len(merged)} queries, total {total}s -> {out_file}, {base_file}")


if __name__ == "__main__":
    main()
