#!/usr/bin/env python3
"""Independent check of mm_phash_cluster at scales where the DuckDB
recursive-CTE oracle runs out of memory (the transitive-closure UNION
cannot spill): union-find over the mm_phash pair dump — which IS
DuckDB-hash-verified at the same scale — must reproduce the cluster
dump exactly (labels = min-id component representative, sizes, keep
flags). Components are a deterministic function of the pair set, so
pairs-exact + this check together pin the cluster entry.

Usage: verify_cluster_unionfind.py <verify_outdir>
  (after `sbt "runMain graft.Verify <sfdir> <outdir> mm_phash"`)
"""
import os, sys, collections
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import unionfind  # the ONE min-label replay, shared with verify_sweep.py


def main(outdir):
    pairs = pq.read_table(f"{outdir}/mm_phash", columns=["ia", "ib"]).to_pydict()
    clus = pq.read_table(f"{outdir}/mm_phash_cluster").to_pydict()

    find, union = unionfind.make()
    members = set(clus["media_id"])
    for a, b in zip(pairs["ia"], pairs["ib"]):
        union(a, b)
    labels = {m: find(m) for m in members}
    sizes = collections.Counter(labels.values())

    bad = 0
    for i in range(len(clus["media_id"])):
        m = clus["media_id"][i]
        ok = (clus["cluster_id"][i] == labels[m]
              and clus["n_members"][i] == sizes[labels[m]]
              and clus["keep"][i] == (m == labels[m]))
        if not ok:
            bad += 1
            if bad <= 5:
                print(f"MISMATCH media_id={m}: got (cluster={clus['cluster_id'][i]}, "
                      f"n={clus['n_members'][i]}, keep={clus['keep'][i]}) "
                      f"want (cluster={labels[m]}, n={sizes[labels[m]]}, "
                      f"keep={m == labels[m]})")
    # every id in a pair must appear in the cluster dump
    missing = sum(1 for a in set(pairs["ia"]) | set(pairs["ib"]) if a not in members)
    n = len(clus["media_id"])
    if bad == 0 and missing == 0:
        print(f"PASS  mm_phash_cluster ({n} rows, {len(sizes)} clusters, "
              f"union-find over {len(pairs['ia'])} verified pairs)")
        return 0
    print(f"FAIL  {bad}/{n} rows mismatch, {missing} pair ids missing")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
