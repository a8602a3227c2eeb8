"""Per-vertex / per-edge HLL approximations: ApproxEmbeddedness and
ApproxClusteringCoefficient analogs (ApproxEmbeddedness.scala:38,
ApproxClusteringCoefficient.scala:20 — the reference estimates
neighborhood intersections by merging HyperLogLogPlus sketches,
HLLUtils.scala).

Design: one (V, m) uint8 register matrix holds every vertex's neighbor-set
sketch (built by one vectorized 2-D scatter-max over the edge list);
per-edge intersection sizes come from the inclusion–exclusion identity
|A∩B| = E(A) + E(B) − E(A∪B) where the union sketch is the register-wise
max — the mergeability that makes HLL work.  Per-edge estimation fans out
over edge-range chunks as Ray tasks with the register matrix broadcast
once (``ray.put``), the same shape as the triangle wedge chunks.

Approximate by construction → verified against the exact operators with
error tolerances in pytest, surfaced as rows-only driver queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ...stages.edges import canonical_edges
from ...util import round_away
from .hyperball import _estimate
from .triangles import _gather_canonical

_EDGE_CHUNK = 200_000


def _vertex_hashes(vids: np.ndarray, p: int, seed: int):
    """(register index, rank) per vertex id — hashed once, reused for every
    sketch the vertex appears in.  md5-lower-64 masked to 63 bits (the
    engine/oracle hash contract): DuckDB's md5_number_lower reproduces
    every register, so both approx operators are exactly SQL-checkable."""
    from ..dedup import _md5_lower64

    m = 1 << p
    h = _md5_lower64([f"{seed}:{v}" for v in vids.tolist()]) & np.uint64(
        0x7FFFFFFFFFFFFFFF
    )
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    width = 63 - p
    rank = np.full(len(vids), width + 1, dtype=np.uint8)
    nz = w > 0
    rank[nz] = (width - np.floor(np.log2(w[nz].astype(np.float64)))).astype(np.uint8)
    return idx, rank


def _neighbor_sketches(si: np.ndarray, di: np.ndarray, V: int, vids: np.ndarray,
                       p: int, seed: int) -> np.ndarray:
    """(V, 2^p) uint8 neighbor-set register matrix over the undirected
    simple graph — one vectorized scatter-max, no per-vertex loop."""
    m = 1 << p
    idx, rank = _vertex_hashes(vids, p, seed)
    regs = np.zeros((V, m), dtype=np.uint8)
    np.maximum.at(regs, (si, idx[di]), rank[di])
    np.maximum.at(regs, (di, idx[si]), rank[si])
    return regs


@ray.remote
def _edge_common_chunk(refs, lo: int, hi: int):
    """|N(u) ∩ N(v)| estimates for the edge chunk [lo, hi).

    Union registers are the element-wise max, so 2^(−union_reg) is the
    element-wise MIN of the precomputed 2^(−reg) rows — the per-edge union
    estimate is one min+sum over float32 rows, never re-exponentiated."""
    pow2, zmask, size_est, s_idx, d_idx = refs
    A = pow2[s_idx[lo:hi]]
    B = pow2[d_idx[lo:hi]]
    m = A.shape[1]
    alpha = 0.7213 / (1 + 1.079 / m)
    denom = np.minimum(A, B).sum(axis=1, dtype=np.float64)
    union = alpha * m * m / denom
    zeros = (zmask[s_idx[lo:hi]] & zmask[d_idx[lo:hi]]).sum(axis=1).astype(np.float64)
    small = (union <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1e-12), 1.0))
    union[small] = lin[small]
    common = size_est[s_idx[lo:hi]] + size_est[d_idx[lo:hi]] - union
    return np.maximum(common, 0.0)


def _approx_common_per_edge(edges: Dataset, p: int, seed: int):
    """Shared core: canonical edges + per-edge approximate common-neighbor
    counts. Returns (s, d, si, di, vids, common)."""
    canon = canonical_edges(edges).materialize()
    if canon.count() > LOCAL_EDGE_THRESHOLD:
        raise NotImplementedError(
            "approx variants gather the canonical edge list (register matrix "
            "is V×2^p bytes); above LOCAL_EDGE_THRESHOLD use the exact "
            "Dataset-join operators (embeddedness/_clustering_distributed)"
        )
    s, d = _gather_canonical(canon)
    if len(s) == 0:
        return s, d, s, d, np.empty(0, np.int64), np.empty(0)
    vids = np.unique(np.concatenate([s, d]))
    V = len(vids)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    regs = _neighbor_sketches(si, di, V, vids, p, seed)
    size_est = _estimate(regs)
    pow2 = np.exp2(-regs.astype(np.float32))
    zmask = regs == 0
    refs = ray.put((pow2, zmask, size_est, si, di))
    chunks = [
        _edge_common_chunk.remote(refs, lo, min(lo + _EDGE_CHUNK, len(s)))
        for lo in range(0, len(s), _EDGE_CHUNK)
    ]
    common = np.concatenate(ray.get(chunks)) if chunks else np.empty(0)
    return s, d, si, di, vids, common


def approx_embeddedness(edges: Dataset, p: int = 8, seed: int = 19) -> Dataset:
    """(src, dst, common) per canonical src<dst edge — HLL-approximate
    common-neighbor counts (ApproxEmbeddedness.scala:38)."""
    import ray.data as rd

    s, d, _, _, _, common = _approx_common_per_edge(edges, p, seed)
    return rd.from_arrow(
        pa.table({"src": s, "dst": d, "common": round_away(common, 6)})
    )


def approx_clustering_coefficient(edges: Dataset, p: int = 8, seed: int = 19) -> Dataset:
    """(id, clustering) — cc(v) ≈ Σ_incident common(u,v) / (deg·(deg−1))
    (each triangle at v is counted twice in the incident sum)
    (ApproxClusteringCoefficient.scala:20)."""
    import ray.data as rd

    s, d, si, di, vids, common = _approx_common_per_edge(edges, p, seed)
    if len(s) == 0:
        return rd.from_arrow(
            pa.table({"id": vids, "clustering": np.empty(0, np.float64)})
        )
    V = len(vids)
    tri2 = np.bincount(si, weights=common, minlength=V) + np.bincount(
        di, weights=common, minlength=V
    )
    deg = np.bincount(si, minlength=V) + np.bincount(di, minlength=V)
    denom = deg.astype(np.float64) * (deg - 1)
    cc = np.zeros(V)
    nz = denom > 0
    cc[nz] = np.clip(tri2[nz] / denom[nz], 0.0, 1.0)
    return rd.from_arrow(pa.table({"id": vids, "clustering": round_away(cc, 6)}))
