"""Sampled Brandes betweenness centrality — engine-native addition (the
reference's centrality operator is HyperBall harmonic/closeness,
HyperBallCentrality.scala:32; betweenness is the classic sibling it
lacks).  Algorithm: Brandes 2001 single-source dependency accumulation
with the Brandes-Pich 2007 source-sampling estimator (exact when
``k_samples >= V``); both are published, public algorithms.

Ray shape: the canonical undirected CSR is built once and ``ray.put``
ONCE; the sampled sources are split into chunks, one task per chunk runs
the numpy level-synchronous Brandes sweep over the shared read-only CSR
and returns ONE V-length partial dependency vector; the driver sums the
few chunk vectors.  Per-task memory is O(V + E) — the same local-regime
envelope as the triangle CSR kernel, so the gate mirrors it: above
LOCAL_EDGE_THRESHOLD edges, use hyperball centrality (the reference's
own choice at scale) instead.
"""

from __future__ import annotations

import numpy as np
import ray
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD


def _brandes_sources(indptr, indices, sources, V):
    """Partial betweenness: Σ_{s in sources} dependency_s(v), Brandes'
    Algorithm 1 with each BFS level processed as one vectorized step."""
    acc = np.zeros(V, dtype=np.float64)
    counts_all = np.diff(indptr)
    for s in sources:
        dist = np.full(V, -1, dtype=np.int32)
        sigma = np.zeros(V, dtype=np.float64)
        dist[s] = 0
        sigma[s] = 1.0
        frontier = np.array([s], dtype=np.int64)
        level_edges = []  # (v, w) arrays with dist[w] == dist[v] + 1
        d = 0
        while frontier.size:
            starts = indptr[frontier]
            cnt = counts_all[frontier]
            tot = int(cnt.sum())
            if tot == 0:
                break
            base = np.repeat(starts, cnt)
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt
            )
            nbrs = indices[base + within]
            srcs = np.repeat(frontier, cnt)
            # first touch: assign next level
            unseen = dist[nbrs] == -1
            dist[nbrs[unseen]] = d + 1
            # tree edges = edges into the next level (incl. just-assigned)
            down = dist[nbrs] == d + 1
            v_e, w_e = srcs[down], nbrs[down]
            np.add.at(sigma, w_e, sigma[v_e])
            level_edges.append((v_e, w_e))
            frontier = np.unique(nbrs[unseen])
            d += 1
        delta = np.zeros(V, dtype=np.float64)
        for v_e, w_e in reversed(level_edges):
            if len(v_e) == 0:
                continue
            contrib = sigma[v_e] / sigma[w_e] * (1.0 + delta[w_e])
            np.add.at(delta, v_e, contrib)
        delta[s] = 0.0
        acc += delta
    return acc


@ray.remote
def _brandes_chunk(csr_ref, sources):
    indptr, indices, V = csr_ref
    return _brandes_sources(indptr, indices, sources, V)


def betweenness(
    edges: Dataset,
    k_samples: int = 64,
    seed: int = 0,
    normalized: bool = True,
    chunk_size: int = 16,
) -> Dataset:
    """(id, betweenness) over the undirected simple graph.  Exact when
    ``k_samples >= V`` (all sources swept), else the Brandes-Pich
    estimator scaled by V/k.  Undirected counting: each unordered pair
    contributes once (the standard /2); ``normalized`` divides by
    (V-1)(V-2)/2."""
    import pyarrow as pa
    import ray.data as rd

    from ...stages.edges import canonical_edges
    from .triangles import _gather_canonical

    canon = canonical_edges(edges).materialize()
    n_edges = canon.count()
    if n_edges > LOCAL_EDGE_THRESHOLD:
        raise ValueError(
            f"betweenness: {n_edges} edges exceed the local-regime gate "
            f"({LOCAL_EDGE_THRESHOLD}); use hyperball harmonic centrality "
            "for the large-graph regime (functions/graph/hyperball.py)"
        )
    s, d = _gather_canonical(canon)
    vids = np.unique(np.concatenate([s, d])) if len(s) else np.empty(0, np.int64)
    V = len(vids)
    if V == 0:
        return rd.from_arrow(
            pa.table(
                {"id": pa.array([], pa.int64()), "betweenness": pa.array([], pa.float64())}
            )
        )
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    # undirected CSR: both directions
    u = np.concatenate([si, di])
    w = np.concatenate([di, si])
    order = np.argsort(u, kind="stable")
    u, w = u[order], w[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(indptr, u + 1, 1)
    np.cumsum(indptr, out=indptr)
    csr_ref = ray.put((indptr, w, V))

    rng = np.random.default_rng(seed)
    if k_samples >= V:
        sources = np.arange(V, dtype=np.int64)
        scale = 1.0
    else:
        sources = np.sort(rng.choice(V, size=k_samples, replace=False)).astype(np.int64)
        scale = V / k_samples
    chunks = [
        _brandes_chunk.remote(csr_ref, sources[i : i + chunk_size])
        for i in range(0, len(sources), chunk_size)
    ]
    total = np.sum(ray.get(chunks), axis=0)
    bc = total * scale / 2.0  # undirected: each pair counted from both sides
    if normalized and V > 2:
        bc = bc / ((V - 1) * (V - 2) / 2.0)
    return rd.from_arrow(
        pa.table({"id": vids, "betweenness": np.round(bc, 9)})
    )
