"""Synthetic graph generators (CreateVertexSet.scala:15,
FastRandomEdgeBundle.scala:29, ScaleFreeEdgeBundle.scala:37 roles),
re-expressed as deterministic, embarrassingly parallel Ray Data sources:
every edge is a pure function of (seed, edge index), so generation is a
``range → map_batches`` with no sequential state (the reference's
preferential-attachment loop is inherently sequential; the Chung–Lu
expected-degree model is the standard parallel stand-in and produces the
same power-law degree profile)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def random_edges(n_vertices: int, n_edges: int, seed: int = 3):
    """FastRandomEdgeBundle analog: uniform random (src, dst), seeded LCG
    over the edge index."""
    import ray.data as rd

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.uint64)
        a = (i * np.uint64(6364136223846793005) + np.uint64(seed)) >> np.uint64(11)
        b = (i * np.uint64(1442695040888963407) + np.uint64(seed * 7 + 1)) >> np.uint64(11)
        return pa.table(
            {
                "src": (a % np.uint64(n_vertices)).astype(np.int64),
                "dst": (b % np.uint64(n_vertices)).astype(np.int64),
            }
        )

    return rd.range(n_edges).map_batches(gen, batch_format="pyarrow")


def scale_free_edges(
    n_vertices: int, n_edges: int, gamma: float = 2.5, seed: int = 3
):
    """ScaleFreeEdgeBundle analog (Chung–Lu expected-degree model):
    endpoint v is drawn with probability ∝ (v+1)^(−1/(γ−1)) by inverting
    the cumulative weight with searchsorted over hashed uniforms.  The
    cumulative array is O(V) and broadcast once (``ray.put``) — the same
    V-fits-in-memory regime as the dense Graph handle."""
    import ray.data as rd

    w = np.power(np.arange(1, n_vertices + 1, dtype=np.float64), -1.0 / (gamma - 1.0))
    cum = np.cumsum(w)
    cum /= cum[-1]
    cum_ref = ray.put(cum)

    def gen(t: pa.Table) -> pa.Table:
        c = ray.get(cum_ref)
        i = t.column("id").to_numpy().astype(np.uint64)
        a = (i * np.uint64(2654435761) + np.uint64(seed)) * np.uint64(
            0x9E3779B97F4A7C15
        )
        b = (i * np.uint64(40503) + np.uint64(seed * 13 + 5)) * np.uint64(
            0xBF58476D1CE4E5B9
        )
        ua = (a >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        ub = (b >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        src = np.searchsorted(c, ua).astype(np.int64)
        dst = np.searchsorted(c, ub).astype(np.int64)
        keep = src != dst
        return pa.table({"src": src[keep], "dst": dst[keep]})

    return rd.range(n_edges).map_batches(gen, batch_format="pyarrow")
