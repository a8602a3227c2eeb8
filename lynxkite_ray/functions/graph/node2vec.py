"""Node2Vec analog (reference: Sphynx node2vec.go / pytorch-geometric on
the single-node python domain, Sphynx.scala:17-201).

Two stages, both pinned-deterministic (the reference's SGD sampling is
nondeterministic; exact-match verification forces pinning, same policy as
labelprop.py):

1. **Walks** — second-order p/q-biased random walks, DISTRIBUTED: the CSR
   adjacency goes to the object store once, an actor pool fetches it in
   ``__init__`` and walks whole start-vertex batches vectorized.  The
   "randomness" is a splitmix64 hash of (walk id, step), so any worker
   produces the identical walk for a given start vertex.
2. **Embeddings** — instead of SGD over skip-gram pairs, the closed-form
   factorization view of node2vec (Qiu et al. 2018, "Network Embedding as
   Matrix Factorization", WSDM — public): window co-occurrence counts →
   shifted PPMI → eigendecomposition.  Deterministic; gated to
   V ≤ NODE2VEC_DENSE_V because the PPMI matrix is V×V (the reference is
   equally single-node here).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

NODE2VEC_DENSE_V = int(os.environ.get("LKR_N2V_DENSE_V", 50_000))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — the deterministic uniform source."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class _WalkActor:
    """Actor-pool walk stage: CSR fetched once per actor; one batch of
    start vertices walks all its steps vectorized (per-step gather over
    the batch, not per-vertex loops)."""

    def __init__(self, csr_ref, walk_length: int, p: float, q: float, seed: int):
        self.indptr, self.nbrs = ray.get(csr_ref)
        self.walk_length = walk_length
        self.p = p
        self.q = q
        self.seed = np.uint64(seed * 0x9E3779B97F4A7C15 % (1 << 64))

    def __call__(self, t: pa.Table) -> pa.Table:
        start = t.column("start").to_numpy()
        wid = t.column("walk_id").to_numpy().astype(np.uint64)
        n = len(start)
        L = self.walk_length
        walk = np.full((n, L), -1, dtype=np.int64)
        walk[:, 0] = start
        prev = np.full(n, -1, dtype=np.int64)
        cur = start.copy()
        alive = self.indptr[cur + 1] > self.indptr[cur]
        for step in range(1, L):
            if not alive.any():
                break
            ai = np.flatnonzero(alive)
            c = cur[ai]
            lo, hi = self.indptr[c], self.indptr[c + 1]
            deg = hi - lo
            # deterministic uniform per (walk, step)
            u = _mix64(wid[ai] * np.uint64(1_000_003) + np.uint64(step) + self.seed)
            if self.p == 1.0 and self.q == 1.0:
                pick = lo + (u % deg.astype(np.uint64)).astype(np.int64)
                nxt = self.nbrs[pick]
            else:
                # biased choice needs per-candidate weights: loop over the
                # (bounded) alive set; each iteration is numpy over one
                # vertex's neighbor slice
                nxt = np.empty(len(ai), dtype=np.int64)
                uf = (u.astype(np.float64) / 2**64)
                for k in range(len(ai)):
                    nb = self.nbrs[lo[k] : hi[k]]
                    w = np.full(len(nb), 1.0 / self.q)
                    pv = prev[ai[k]]
                    if pv >= 0:
                        w[nb == pv] = 1.0 / self.p
                        # distance-1 neighbors of prev get weight 1
                        pnb = self.nbrs[self.indptr[pv] : self.indptr[pv + 1]]
                        w[np.isin(nb, pnb)] = 1.0
                    cw = np.cumsum(w)
                    nxt[k] = nb[np.searchsorted(cw, uf[k] * cw[-1], side="right").clip(0, len(nb) - 1)]
            walk[ai, step] = nxt
            prev[ai] = cur[ai]
            cur[ai] = nxt
            alive[ai] = self.indptr[nxt + 1] > self.indptr[nxt]
        return pa.table(
            {
                "walk_id": wid.astype(np.int64),
                "walk": pa.FixedSizeListArray.from_arrays(
                    pa.array(walk.ravel(), pa.int64()), L
                ),
            }
        )


def node2vec_walks(
    edges: Dataset,
    walk_length: int = 10,
    walks_per_node: int = 4,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 17,
    concurrency: int | None = None,
) -> tuple[Dataset, np.ndarray]:
    """(walks Dataset (walk_id, walk list<int64> of vertex *indices*),
    sorted vertex ids).  -1 pads a walk that hit a sink."""
    import ray.data as rd

    from ...context import pool_size
    from .core import Graph

    if concurrency is None:
        concurrency = pool_size()
    g = Graph.from_edges(edges)
    si, di, _w = g.gather_edges() if g.is_dense else (None, None, None)
    if si is None:
        raise NotImplementedError(
            "node2vec walks need the index-space CSR; beyond the dense "
            "vertex threshold pre-partition the graph"
        )
    V = g.num_vertices
    srcs = np.concatenate([si, di])
    dsts = np.concatenate([di, si])
    order = np.lexsort((dsts, srcs))
    srcs, dsts = srcs[order], dsts[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(srcs, minlength=V), out=indptr[1:])
    csr_ref = ray.put((indptr, dsts))

    starts = rd.range(V * walks_per_node).map_batches(
        lambda t: pa.table(
            {
                "walk_id": t.column("id"),
                "start": pa.array(t.column("id").to_numpy() % V),
            }
        ),
        batch_format="pyarrow",
    )
    walks = starts.map_batches(
        _WalkActor,
        fn_constructor_args=(csr_ref, walk_length, p, q, seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    return walks, g.vids


def node2vec_embeddings(
    edges: Dataset,
    dim: int = 16,
    walk_length: int = 10,
    walks_per_node: int = 4,
    window: int = 3,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 17,
    negative: float = 1.0,
) -> Dataset:
    """(id, embedding) via walk co-occurrence → shifted PPMI → eigh.
    Co-occurrence counting is a distributed grouped aggregate over walk
    windows; only the V×V PPMI factorization is local (gated)."""
    import ray.data as rd

    from ...context import default_partitions
    from ...stages.shuffle import COALESCE_BATCH, grouped_aggregate

    walks, vids = node2vec_walks(
        edges, walk_length, walks_per_node, p, q, seed
    )
    V = len(vids)
    if V > NODE2VEC_DENSE_V:
        raise NotImplementedError(
            "node2vec PPMI factorization is V×V; above LKR_N2V_DENSE_V "
            "coarsen the graph or reduce the vertex set"
        )

    def cooc(t: pa.Table) -> pa.Table:
        col = t.column("walk").combine_chunks()
        L = col.type.list_size
        W = col.flatten().to_numpy().reshape(-1, L)
        us, vs = [], []
        for off in range(1, window + 1):
            a = W[:, :-off].ravel()
            b = W[:, off:].ravel()
            keep = (a >= 0) & (b >= 0)
            us.append(np.concatenate([a[keep], b[keep]]))
            vs.append(np.concatenate([b[keep], a[keep]]))
        u = np.concatenate(us)
        v = np.concatenate(vs)
        # per-block pre-combine before the shuffle
        key = u * V + v
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"u": uk // V, "v": uk % V, "n": cnt.astype(np.int64)}
        )

    counts = grouped_aggregate(
        walks.map_batches(cooc, batch_format="pyarrow", batch_size=COALESCE_BATCH),
        ["u", "v"],
        [("n", "sum", "n")],
        default_partitions(),
    )
    M = np.zeros((V, V))
    for b in counts.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        M[b["u"].to_numpy(), b["v"].to_numpy()] = b["n"].to_numpy()
    total = M.sum()
    if total == 0:
        E = np.zeros((V, dim))
    else:
        Pw = M.sum(axis=1) / total
        Pc = M.sum(axis=0) / total
        with np.errstate(divide="ignore", invalid="ignore"):
            pmi = np.log((M / total) / np.maximum(np.outer(Pw, Pc), 1e-300)) - np.log(
                max(negative, 1e-300)
            )
        ppmi = np.where(M > 0, np.maximum(pmi, 0.0), 0.0)
        ppmi = (ppmi + ppmi.T) / 2  # symmetrize → real spectrum
        evals, evecs = np.linalg.eigh(ppmi)
        order = np.argsort(-np.abs(evals), kind="stable")[:dim]
        E = evecs[:, order] * np.sqrt(np.abs(evals[order]))[None, :]
        # pinned signs (same convention as PCA)
        for i in range(E.shape[1]):
            j = int(np.argmax(np.abs(E[:, i])))
            if E[j, i] < 0:
                E[:, i] = -E[:, i]
    return rd.from_arrow(
        pa.table(
            {
                "id": vids,
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.round(E, 9).ravel(), pa.float64()), E.shape[1]
                ),
            }
        )
    )
