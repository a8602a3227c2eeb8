"""Steiner tree (reference: "Find Steiner tree",
GraphComputationOperations.scala:411, solved by graph_operations/
Dapcstp.scala's prize-collecting solver).  This is the classic
terminal-connecting variant: given an undirected weighted graph and a
terminal set, find the minimum-cost connected subgraph spanning all
terminals.

Exact Dreyfus-Wagner (1971) dynamic program on the gathered local graph —
O(3^k·V + 2^k·(E log V)) for k terminals — behind the same asserted
LOCAL_EDGE_THRESHOLD gate the other whole-graph-resident ops use (cliques,
local Louvain): the operator REFUSES above the gate rather than silently
sampling.  Terminals are capped at 12 (3^12 ≈ 531k subset states).

The DP state S[T][v] = min cost of a tree spanning terminal subset T ∪ {v}
is relaxed by (a) merging two subtrees at v and (b) one Dijkstra pass per
subset (multi-source, seeded with the subset's current column).  Edge
recovery walks the DP back to emit the tree's edge list.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ...stages.edges import canonical_edges
from .triangles import _gather_canonical

MAX_TERMINALS = 12


def steiner_tree(
    edges: Dataset,
    terminals,
    weight_col: str | None = None,
    assume_canonical: bool = False,
) -> Dataset:
    """Returns the tree's edge list (src, dst, cost) with src < dst, sorted;
    total cost = sum of the cost column.  Raises if the terminals are not
    all in one connected component, if there are more than MAX_TERMINALS,
    or if the graph exceeds the local gate."""
    terminals = sorted({int(t) for t in terminals})
    k = len(terminals)
    if k == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "src": np.empty(0, np.int64),
                    "dst": np.empty(0, np.int64),
                    "cost": np.empty(0, np.float64),
                }
            )
        )
    if k > MAX_TERMINALS:
        raise ValueError(
            f"steiner_tree: {k} terminals exceed MAX_TERMINALS={MAX_TERMINALS} "
            "(Dreyfus-Wagner is exponential in the terminal count)"
        )

    if weight_col is None:
        canon = edges if assume_canonical else canonical_edges(edges).materialize()
        if canon.count() > LOCAL_EDGE_THRESHOLD:
            raise ValueError(
                "steiner_tree: graph exceeds LOCAL_EDGE_THRESHOLD; shrink it "
                "(induced_subgraph / k_core) first"
            )
        s, d = _gather_canonical(canon)
        w = np.ones(len(s), dtype=np.float64)
    else:
        if edges.count() > LOCAL_EDGE_THRESHOLD:
            raise ValueError(
                "steiner_tree: graph exceeds LOCAL_EDGE_THRESHOLD; shrink it "
                "(induced_subgraph / k_core) first"
            )
        ss, dd, ww = [], [], []
        for t in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            ss.append(t["src"].to_numpy())
            dd.append(t["dst"].to_numpy())
            ww.append(t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64))
        s = np.concatenate(ss) if ss else np.empty(0, np.int64)
        d = np.concatenate(dd) if dd else np.empty(0, np.int64)
        w = np.concatenate(ww) if ww else np.empty(0, np.float64)
        # canonicalize locally: drop loops, keep min weight per pair
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        order = np.lexsort((w, hi, lo))
        lo, hi, w = lo[order], hi[order], w[order]
        first = np.ones(len(lo), dtype=bool)
        first[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        s, d, w = lo[first], hi[first], w[first]

    # terminals are always vertices (isolated terminals fail the
    # connectivity check below unless k == 1)
    vids = np.unique(np.concatenate([s, d, np.asarray(terminals, np.int64)]))
    V = len(vids)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    ti = np.searchsorted(vids, terminals)

    # adjacency (both directions)
    us = np.concatenate([si, di])
    vs = np.concatenate([di, si])
    uw = np.concatenate([w, w])
    order = np.argsort(us, kind="stable")
    us, vs, uw = us[order], vs[order], uw[order]
    indptr = np.zeros(V + 1, np.int64)
    np.cumsum(np.bincount(us, minlength=V), out=indptr[1:])

    INF = np.inf
    full = (1 << k) - 1
    # S[T][v]; parent[T][v] = ("merge", T1) | ("edge", u)
    S = np.full((full + 1, V), INF)
    parent: list[dict] = [dict() for _ in range(full + 1)]
    for i, t in enumerate(ti):
        S[1 << i][t] = 0.0

    def dijkstra_relax(T: int):
        """Multi-source Dijkstra over column T (tree-growing step)."""
        col = S[T]
        heap = [(c, int(v)) for v, c in enumerate(col) if c < INF]
        heapq.heapify(heap)
        while heap:
            c, v = heapq.heappop(heap)
            if c > col[v]:
                continue
            for e in range(indptr[v], indptr[v + 1]):
                u = int(vs[e])
                nc = c + uw[e]
                if nc < col[u] - 1e-12:
                    col[u] = nc
                    parent[T][u] = ("edge", v)
                    heapq.heappush(heap, (nc, u))

    for T in range(1, full + 1):
        if T & (T - 1) == 0:  # singleton: just grow
            dijkstra_relax(T)
            continue
        # merge: T = T1 ∪ T2, T1 = proper non-empty submask containing lowest bit
        lowest = T & -T
        T1 = (T - 1) & T
        while T1 > 0:
            if T1 & lowest:  # canonical split (avoid double enumeration)
                T2 = T ^ T1
                merged = S[T1] + S[T2]
                better = merged < S[T] - 1e-12
                if better.any():
                    idx = np.flatnonzero(better)
                    S[T][idx] = merged[idx]
                    for v in idx:
                        parent[T][int(v)] = ("merge", T1)
            T1 = (T1 - 1) & T
        dijkstra_relax(T)

    root = int(ti[0])
    if not np.isfinite(S[full][root]):
        raise ValueError(
            "steiner_tree: terminals are not all connected in the graph"
        )

    # backtrack to edges
    tree: set[tuple[int, int]] = set()
    stack = [(full, root)]
    while stack:
        T, v = stack.pop()
        step = parent[T].get(v)
        if step is None:
            continue  # base state
        kind, arg = step
        if kind == "edge":
            u = arg
            a, b = (u, v) if u < v else (v, u)
            tree.add((a, b))
            stack.append((T, u))
        else:
            T1 = arg
            stack.append((T1, v))
            stack.append((T ^ T1, v))

    if not tree:
        return rd.from_arrow(
            pa.table(
                {
                    "src": np.empty(0, np.int64),
                    "dst": np.empty(0, np.int64),
                    "cost": np.empty(0, np.float64),
                }
            )
        )
    # cost per tree edge from the canonical weight map
    wmap = {}
    for a, b, c in zip(si, di, w):
        aa, bb = (int(a), int(b)) if a < b else (int(b), int(a))
        cur = wmap.get((aa, bb))
        if cur is None or c < cur:
            wmap[(aa, bb)] = float(c)
    rows = sorted(tree)
    return rd.from_arrow(
        pa.table(
            {
                "src": np.array([vids[a] for a, _ in rows], np.int64),
                "dst": np.array([vids[b] for _, b in rows], np.int64),
                "cost": np.array([wmap[(a, b)] for a, b in rows], np.float64),
            }
        )
    )
