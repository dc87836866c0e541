#!/usr/bin/env python3
"""Pool per-entry minima/medians across >=2 BenchScale runs (same code,
same scale): min of mins, median kept from the run with the lower min
(dispersion context only). Usage: pool_mins.py out.json runA.json runB.json..."""
import json, sys

out, runs = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
# a run with failed entries (null minima) must not pool: its totals are
# not comparable and the failure needs fixing, not averaging away
for p, r in zip(sys.argv[2:], runs):
    failed = r.get("failed") or [k for k, v in r["queries_min"].items() if v is None]
    if failed:
        sys.exit(f"refusing to pool {p}: failed entries {failed}")
keys = set(runs[0]["queries_min"])
for r in runs[1:]:
    keys &= set(r["queries_min"])
pooled_min, pooled_med, pooled_first = {}, {}, {}
for k in sorted(keys):
    best = min(runs, key=lambda r: r["queries_min"][k])
    pooled_min[k] = best["queries_min"][k]
    pooled_med[k] = best["queries_median"][k]
    # cold cost: min over runs of each run's FIRST iteration (the least-
    # noise estimate of the un-warmed cost; older files lack the field)
    firsts = [r["queries_first"][k] for r in runs if "queries_first" in r]
    if firsts:
        pooled_first[k] = min(firsts)
doc = dict(runs[0])
doc["queries_min"] = pooled_min
doc["queries_median"] = pooled_med
if pooled_first:
    doc["queries_first"] = pooled_first
doc["value"] = round(sum(pooled_min.values()), 3)
doc["pooled_runs"] = len(runs)
json.dump(doc, open(out, "w"))
print("wrote", out, "entries", len(pooled_min), "total_min", doc["value"])
