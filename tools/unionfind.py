#!/usr/bin/env python3
"""Min-id union-find shared by the sweep's component replay
(verify_sweep.py) and the standalone cluster check
(verify_cluster_unionfind.py) — ONE implementation of the min-label
invariant that mirrors graft's Components.minLabel, so the two checks
can never pin different component semantics."""


def make():
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id representative, matching Components.minLabel
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    return find, union


def labels(ia, ib):
    """Component label (min reachable id) for every node in the pair
    lists; returns (sorted nodes, labels aligned to nodes)."""
    find, union = make()
    for a, b in zip(ia, ib):
        union(a, b)
    nodes = sorted(set(ia) | set(ib))
    return nodes, [find(n) for n in nodes]
