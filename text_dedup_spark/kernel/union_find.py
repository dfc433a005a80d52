"""Union-Find test oracle.

Mirrors the reference's single-node structure (utils/union_find.py:7-28):
path compression, no rank, and ``union`` links both roots to min(px, py) —
so the cluster representative is always the minimum id, matching the
distributed connected-components invariant (minhash_spark.py:51-55:
roots never appear as keys in the output map).

Used ONLY in tests, as the ground-truth clustering to compare the
distributed DataFrame pipeline against.
"""

from __future__ import annotations


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        if x not in self.parent:
            self.parent[x] = x
            return x
        if self.parent[x] != x:
            self.parent[x] = self.find(self.parent[x])
        return self.parent[x]

    def union(self, x: int, y: int) -> None:
        px = self.find(x)
        py = self.find(y)
        self.parent[px] = self.parent[py] = min(px, py)

    def components(self) -> dict[int, int]:
        """id -> min-id-of-cluster for every id ever seen, EXCLUDING roots
        (the reference's output convention: the representative is absent, so
        a left-anti join keeps exactly one row per cluster)."""
        out = {}
        for x in list(self.parent):
            r = self.find(x)
            if r != x:
                out[x] = r
        return out

    def clusters(self) -> dict[int, set[int]]:
        """root -> full member set (including the root)."""
        out: dict[int, set[int]] = {}
        for x in list(self.parent):
            out.setdefault(self.find(x), set()).add(x)
        return out
