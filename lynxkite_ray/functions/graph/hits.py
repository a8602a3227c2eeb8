"""HITS hubs-and-authorities (Kleinberg 1999, public algorithm) over a
Graph handle — the other canonical web-link-graph centrality next to
PageRank; not in the reference's operator set.

Power iteration with L2 normalization each half-step:
    a ← normalize(Aᵀ h)        (authority: sum of incoming hub scores)
    h ← normalize(A a)         (hub: sum of outgoing authority scores)

Shard shapes: the authority half-step reuses the dst-sorted range-slice
gather (PageRank's `_pr_contrib` shape — each shard returns only its dst
range); the hub half-step scatters back to src, whose ids span the whole
index space within any shard, so each shard returns a compacted
(unique-src, partial) pair and the driver adds the small partials —
O(Σ distinct src per shard), not O(shards × V).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .core import Graph


@ray.remote
def _auth_contrib(shard: pa.Table, h: np.ndarray):
    si = shard.column("si").to_numpy()
    di = shard.column("di").to_numpy()
    w = shard.column("w").to_numpy()
    if len(di) == 0:
        return 0, np.zeros(0)
    lo = int(di.min())
    hi = int(di.max()) + 1
    return lo, np.bincount(di - lo, weights=h[si] * w, minlength=hi - lo)


@ray.remote
def _hub_contrib(shard: pa.Table, a: np.ndarray):
    si = shard.column("si").to_numpy()
    di = shard.column("di").to_numpy()
    w = shard.column("w").to_numpy()
    if len(si) == 0:
        return np.zeros(0, np.int64), np.zeros(0)
    us, inv = np.unique(si, return_inverse=True)
    part = np.zeros(len(us), dtype=np.float64)
    np.add.at(part, inv, a[di] * w)
    return us, part


def hits(graph: Graph, iterations: int = 30, tol: float = 1e-9):
    """Returns (hub, authority) float64 vectors aligned with graph.vids,
    each L2-normalized.  Early-stops when both vectors move < tol in max
    norm between iterations."""
    V = graph.num_vertices
    h = np.full(V, 1.0 / np.sqrt(V) if V else 0.0, dtype=np.float64)
    a = np.zeros(V, dtype=np.float64)
    for _ in range(iterations):
        h_ref = ray.put(h)
        parts = ray.get([_auth_contrib.remote(s, h_ref) for s in graph.shard_refs])
        a_new = np.zeros(V, dtype=np.float64)
        for lo, vec in parts:
            a_new[lo : lo + len(vec)] += vec
        n = np.linalg.norm(a_new)
        if n > 0:
            a_new /= n
        a_ref = ray.put(a_new)
        parts = ray.get([_hub_contrib.remote(s, a_ref) for s in graph.shard_refs])
        h_new = np.zeros(V, dtype=np.float64)
        for us, vec in parts:
            h_new[us] += vec
        n = np.linalg.norm(h_new)
        if n > 0:
            h_new /= n
        done = (
            float(np.max(np.abs(a_new - a), initial=0.0)) < tol
            and float(np.max(np.abs(h_new - h), initial=0.0)) < tol
        )
        a, h = a_new, h_new
        if done:
            break
    return h, a
