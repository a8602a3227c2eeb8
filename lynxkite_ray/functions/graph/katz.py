"""Katz and eigenvector centrality (NetworKit centrality-menu analogs —
reference: GraphComputationOperations.scala:95-98 "Compute centrality"
katz / eigenvector choices, executed by networkit_compute_double_attribute.go).

Both are the same gather shape as PageRank/HITS: per-shard dst-range
contributions of x[src]·w summed into the next vector
(hits.py::_auth_contrib is reused verbatim) — one broadcast of the current
vector per round, partials combined on the driver.  Fixed iteration counts
(no early stop) so the unrolled SQL oracles replay the identical float64
arithmetic.
"""

from __future__ import annotations

import numpy as np
import ray

from .core import Graph
from .hits import _auth_contrib


def _gather_in(graph: Graph, x: np.ndarray) -> np.ndarray:
    """y[v] = Σ_{(u,v) ∈ E} w(u,v) · x[u] — one round of Aᵀx."""
    xr = ray.put(x)
    parts = ray.get([_auth_contrib.remote(s, xr) for s in graph.shard_refs])
    y = np.zeros(graph.num_vertices, dtype=np.float64)
    for lo, vec in parts:
        y[lo : lo + len(vec)] += vec
    return y


def katz(
    graph: Graph,
    alpha: float = 0.05,
    beta: float = 1.0,
    iterations: int = 30,
) -> np.ndarray:
    """Katz centrality x = Σ_k α^k (Aᵀ)^k · β𝟙 via the truncated fixed-point
    iteration x ← α·Aᵀx + β, x₀ = 0 (Katz 1953).  Converges iff
    α < 1/λmax(A); callers pick α for their graph (the precedence-graph
    query uses 0.05 against λmax ≈ 15 at the gate scale).  Unnormalized —
    the raw walk-count series, so the SQL oracle is a literal unroll."""
    V = graph.num_vertices
    x = np.zeros(V, dtype=np.float64)
    for _ in range(iterations):
        x = alpha * _gather_in(graph, x) + beta
    return x


def eigenvector_centrality(graph: Graph, iterations: int = 50) -> np.ndarray:
    """Power iteration x ← normalize(Aᵀx), x₀ = 𝟙/√V, fixed ``iterations``
    rounds, L2-normalized.  On a symmetrized edge bundle this is classic
    (undirected) eigenvector centrality; on a directed bundle it is the
    right-eigenvector (authority-like) variant."""
    V = graph.num_vertices
    x = np.full(V, 1.0 / np.sqrt(V) if V else 0.0, dtype=np.float64)
    for _ in range(iterations):
        y = _gather_in(graph, x)
        n = float(np.linalg.norm(y))
        if n == 0.0:
            return y
        x = y / n
    return x
