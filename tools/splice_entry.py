#!/usr/bin/env python3
"""Splice freshly re-measured entries into an existing pooled BenchScale
file: every entry present in the donor replaces the target's min/median
(a REPLACEMENT, not a min-merge — the donor was measured at newer code,
so keeping an older, faster number would misreport HEAD), and the total
is recomputed. Usage: splice_entry.py target_pooled.json donor_pooled.json"""
import json, sys

target_path, donor_path = sys.argv[1], sys.argv[2]
target = json.load(open(target_path))
donor = json.load(open(donor_path))
if donor.get("failed"):
    sys.exit(f"refusing to splice {donor_path}: failed entries {donor['failed']}")
for k, v in donor["queries_min"].items():
    old = target["queries_min"].get(k)
    target["queries_min"][k] = v
    target["queries_median"][k] = donor["queries_median"][k]
    if "queries_first" in donor and k in donor["queries_first"]:
        target.setdefault("queries_first", {})[k] = donor["queries_first"][k]
    else:
        # donor has no cold-cost figure: drop the target's stale one
        # rather than pairing an old first-run time with the new min
        target.get("queries_first", {}).pop(k, None)
    print(f"{target_path}: {k} {old} -> {v}")
target["value"] = round(sum(target["queries_min"].values()), 3)
json.dump(target, open(target_path, "w"))
print(f"wrote {target_path}, total_min {target['value']}")
