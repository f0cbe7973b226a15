#!/usr/bin/env python3
"""r16 wall-bench min-merge with TWO changed-code epochs.

Same per-query-min methodology as tools/merge_bench.py (each run is
itself best-of-2, so a min never hides work), but this round's changes
landed in two batches, so changed queries draw only from runs that
include their change:

  epoch A (landed before run 2 — arrow gate, bm25 fusion, xf floors,
           InternalRow path, recallEval checkpoint): runs >= 2
  epoch B (landed before run 3 — kernelFloor, cheap-closure floor
           reverts): runs >= 3
  everything else: all runs

Usage: merge_bench_r16.py <out.json> <baseline.json> <run1.json> <run2.json> ...
(positional run order IS the epoch order; guards empty sample lists
with an explicit error naming the query — the merge_heavy_r15 ADVICE.)
"""
import json
import sys

EPOCH_A = {"xf_pyscript", "xf_pylookup", "xf_pyerrors", "xf_pyalerts",
           "xf_pybytes", "q_bm25", "q_bm25_fixed", "q_rrf", "xf_script",
           "xf_enum", "xf_nested", "ann_recall_eval"}
EPOCH_B = {"dd_ngram_jaccard", "dd_threshold_hist", "xf_args",
           "xf_alerts", "xf_lookup"}


def main():
    out_file, base_file = sys.argv[1], sys.argv[2]
    runs = [json.load(open(f)) for f in sys.argv[3:]]
    merged, meta = {}, []
    for idx, r in enumerate(runs):  # idx 0 = run 1
        meta.append({"loadavg": r.get("loadavg"),
                     "value": round(r.get("value", -1), 1),
                     "n": len(r.get("queries", {}))})
        for k, v in r["queries"].items():
            if v < 0:
                continue
            if k in EPOCH_A and idx < 1:
                continue
            if k in EPOCH_B and idx < 2:
                continue
            merged[k] = min(merged.get(k, v), v)
    all_keys = set().union(*(set(r["queries"]) for r in runs))
    missing = sorted(k for k in all_keys if k not in merged)
    if missing:
        sys.exit(f"no eligible post-change sample for: {missing}")
    total = round(sum(merged.values()), 3)
    out = {"metric": "total", "value": total, "unit": "sec",
           "merge": (f"r16 per-query min of {len(runs)} quiet full runs; "
                     f"epoch-A keys (changed before run 2) from runs 2+, "
                     f"epoch-B keys (changed before run 3) from runs 3+"),
           "epoch_a": sorted(EPOCH_A), "epoch_b": sorted(EPOCH_B),
           "runs": meta,
           "queries": {k: merged[k] for k in sorted(merged)}}
    json.dump(out, open(out_file, "w"), indent=1)
    json.dump({"queries": {k: merged[k] for k in sorted(merged)}},
              open(base_file, "w"), indent=1)
    print(f"merged {len(merged)} queries, total {total}s -> {out_file}")


if __name__ == "__main__":
    main()
