"""Graph layout (reference: "Place vertices with edge lengths",
GraphComputationOperations.scala:130, NetworKit PivotMDS via
networkit_compute_vector_attribute.go).

PivotMDS (Brandes & Pich 2007, public): BFS distances from k pivot
vertices → double-centered squared-distance matrix C (n × k) → positions
are C projected onto the top-d eigenvectors of CᵀC.  The expensive part —
one BFS per pivot — fans out over pivot chunks as Ray tasks against a
broadcast CSR (the closeness kernel's shape); the driver only handles the
n × k distance matrix and a k × k eigenproblem.

Deterministic: pivots are the k vertices with smallest
md5-lower-64("seed:id") (the engine's standard seeded choice), numpy's
symmetric eigensolver is deterministic, and each axis's sign is pinned so
the coordinate with the largest magnitude is positive.  Unreachable pairs
get (max finite distance + 1) — the standard practical PivotMDS treatment
for disconnected graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ..dedup import _md5_lower64
from .closeness import _csr
from .core import Graph

_PIVOT_CHUNK = 32


@ray.remote
def _bfs_dist_chunk(csr, src_idx: np.ndarray, V: int):
    """Full distance vectors (int64, -1 = unreachable) for a pivot chunk."""
    indptr, nbrs = csr
    out = np.full((len(src_idx), V), -1, dtype=np.int64)
    for k, s in enumerate(src_idx):
        dist = out[k]
        dist[s] = 0
        frontier = np.array([s], dtype=np.int64)
        d = 0
        while len(frontier):
            starts = indptr[frontier]
            cnt = indptr[frontier + 1] - starts
            total = int(cnt.sum())
            if total == 0:
                break
            pos = np.repeat(starts, cnt) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
            )
            nxt = np.unique(nbrs[pos])
            nxt = nxt[dist[nxt] < 0]
            if len(nxt) == 0:
                break
            d += 1
            dist[nxt] = d
            frontier = nxt
    return out


def pivot_mds(
    graph: Graph, dimensions: int = 2, pivots: int = 100, seed: int = 1
) -> Dataset:
    """(id, x, y[, ...]) PivotMDS coordinates, rounded to 6 decimals."""
    from ...util import round_away

    if graph.num_edges > LOCAL_EDGE_THRESHOLD:
        raise NotImplementedError(
            "pivot_mds broadcasts the CSR per pivot-BFS task (NetworKit "
            "parity: the graph is in-memory per executor); above "
            "LKR_LOCAL_EDGES reduce with a landmark subsample first"
        )
    V = graph.num_vertices
    k = min(pivots, V)
    h = _md5_lower64([f"{seed}:{v}" for v in graph.vids.tolist()])
    pivot_idx = np.argsort(h, kind="stable")[:k].astype(np.int64)

    si, di, _ = graph.gather_edges()
    csr_ref = ray.put(_csr(si, di, V))
    chunks = [
        pivot_idx[i : i + _PIVOT_CHUNK] for i in range(0, k, _PIVOT_CHUNK)
    ]
    parts = ray.get([_bfs_dist_chunk.remote(csr_ref, c, V) for c in chunks])
    D = (
        np.concatenate(parts, axis=0).T.astype(np.float64)
        if parts
        else np.zeros((V, 0))
    )  # (V, k)
    if D.size:
        finite_max = D.max() if (D >= 0).all() else D[D >= 0].max() if (D >= 0).any() else 0.0
        D[D < 0] = finite_max + 1.0
    C = -0.5 * np.square(D)
    C = C - C.mean(axis=0, keepdims=True) - C.mean(axis=1, keepdims=True) + C.mean()
    # top-d eigenvectors of the k × k Gram matrix; positions = C @ e
    evals, evecs = np.linalg.eigh(C.T @ C)
    order = np.argsort(evals)[::-1][:dimensions]
    X = C @ evecs[:, order]
    for j in range(X.shape[1]):  # pin each axis's sign
        i = int(np.argmax(np.abs(X[:, j])))
        if X[i, j] < 0:
            X[:, j] = -X[:, j]
    cols = {"id": graph.vids}
    names = ["x", "y", "z"] + [f"c{j}" for j in range(3, dimensions)]
    for j in range(X.shape[1]):
        cols[names[j]] = round_away(X[:, j], 6)
    return rd.from_arrow(pa.table(cols))
