#!/usr/bin/env python3
"""Splice freshly measured entries into the committed BENCH_ALL.json
(row shape {"sf0.1","sf1","sf10","r10","r100","*_first"}), recomputing
ratios and totals — for adding NEW entries (or refreshing single rows)
when the original per-scale pooled files are gone (/tmp wiped between
sessions). Donors are per-scale pooled BenchScale files covering only
the spliced entries; an entry present in any donor is REPLACED wholesale
(not min-merged) so the row reports HEAD's measurement.

Usage: splice_bench_all.py BENCH_ALL.json sf0.1=<pooled> [sf1=<pooled>] [sf10=<pooled>]
"""
import json, sys

target_path = sys.argv[1]
target = json.load(open(target_path))
donors = {}
for arg in sys.argv[2:]:
    name, path = arg.split("=", 1)
    donors[name] = json.load(open(path))

names = set()
for doc in donors.values():
    bad = doc.get("failed") or [k for k, v in doc["queries_min"].items() if v is None]
    if bad:
        sys.exit(f"refusing to splice: failed entries {bad}")
    names |= set(doc["queries_min"])

for k in sorted(names):
    row = {s: None for s in ("sf0.1", "sf1", "sf10")}
    for s, doc in donors.items():
        if k in doc["queries_min"]:
            row[s] = doc["queries_min"][k]
            if k in doc.get("queries_first", {}):
                row[s + "_first"] = doc["queries_first"][k]
    base = row.get("sf0.1")
    if base:
        if row.get("sf1"):
            row["r10"] = round(row["sf1"] / base, 2)
        if row.get("sf10"):
            row["r100"] = round(row["sf10"] / base, 2)
    old = target["entries"].get(k)
    target["entries"][k] = {kk: vv for kk, vv in row.items() if vv is not None}
    print(f"{k}: {old} -> {target['entries'][k]}")

target["n_entries"] = len(target["entries"])
target["totals_sec_min"] = {
    s: round(sum(e[s] for e in target["entries"].values() if e.get(s)), 3)
    for s in ("sf0.1", "sf1", "sf10")}
json.dump(target, open(target_path, "w"))
print(f"wrote {target_path}: n={target['n_entries']} totals={target['totals_sec_min']}")
