"""Greedy vertex coloring — Coloring.scala:21 analog with a PINNED
deterministic order (vertices by (degree desc, id asc) — Welsh-Powell),
run on the local-fallback path (the reference computes coloring in its
single-node Sphynx domain too; ≤ LOCAL_EDGE_THRESHOLD edges).

Validity (no adjacent pair shares a color) is the testable invariant;
the color count is heuristic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ...context import LOCAL_EDGE_THRESHOLD
from .core import Graph


def greedy_coloring(graph: Graph) -> np.ndarray:
    """Returns per-vertex colors (0-based ints) aligned with graph.vids."""
    if graph.num_edges > LOCAL_EDGE_THRESHOLD:
        raise NotImplementedError(
            "coloring runs on the local-fallback path (≤ LOCAL_EDGE_THRESHOLD "
            "edges), mirroring the reference's single-node Sphynx domain"
        )
    si, di, _ = graph.gather_edges()
    V = graph.num_vertices
    keep = si != di
    si, di = si[keep], di[keep]
    # undirected adjacency CSR
    a = np.concatenate([si, di])
    b = np.concatenate([di, si])
    order = np.argsort(a, kind="stable")
    a, b = a[order], b[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(a, minlength=V), out=indptr[1:])
    deg = indptr[1:] - indptr[:-1]
    visit = np.lexsort((np.arange(V), -deg))  # degree desc, id asc
    colors = np.full(V, -1, dtype=np.int64)
    for v in visit:
        used = set(colors[b[indptr[v] : indptr[v + 1]]].tolist())
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors
