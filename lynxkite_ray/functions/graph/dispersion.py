"""Dispersion (Dispersion.scala:49; Backstrom–Kleinberg, arXiv:1310.6753):
for each non-loop directed edge (u, v), the number of pairs {a, b} of
common neighbors of u and v that are neither adjacent nor share a common
neighbor inside N(u)\\{v} — "the extent to which u and v's mutual friends
are not themselves well-connected".

Exact per-edge semantics replicated from the reference:
  srcN   = N(u) \\ {v}                  (undirected neighbors)
  C      = srcN ∩ N(v)
  score  = Σ over unordered pairs (a, b) ⊆ C of
           [ b ∉ N(a)  AND  (N(a) ∩ srcN) ∩ (N(b) ∩ srcN) = ∅ ]

Local-gather design (the reference builds a CompactUndirectedGraph and
iterates edges on executors; we gather under LOCAL_EDGE_THRESHOLD and fan
the edge ranges out as Ray tasks over a broadcast CSR).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ...stages.shuffle import distinct

_CHUNK = 20_000


def _adj_sets(si: np.ndarray, di: np.ndarray, V: int):
    """Sorted undirected neighbor arrays per vertex (CSR)."""
    s = np.concatenate([si, di])
    d = np.concatenate([di, si])
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    keep = np.empty(len(s), dtype=bool)
    if len(s):
        keep[0] = True
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        s, d = s[keep], d[keep]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(s, minlength=V), out=indptr[1:])
    return indptr, d


@ray.remote
def _dispersion_chunk(refs, lo: int, hi: int):
    indptr, nbrs, es, ed = refs
    out = np.zeros(hi - lo)
    for k in range(lo, hi):
        u, v = int(es[k]), int(ed[k])
        nu = nbrs[indptr[u] : indptr[u + 1]]
        src_n = nu[nu != v]
        nv = nbrs[indptr[v] : indptr[v + 1]]
        common = np.intersect1d(src_n, nv, assume_unique=True)
        if len(common) < 2:
            continue
        # restricted neighborhoods: N(c) ∩ srcN, per common neighbor
        restricted = {
            int(c): frozenset(
                np.intersect1d(
                    nbrs[indptr[c] : indptr[c + 1]], src_n, assume_unique=True
                ).tolist()
            )
            for c in common.tolist()
        }
        score = 0.0
        cl = common.tolist()
        for i in range(len(cl)):
            ra = restricted[cl[i]]
            for j in range(i + 1, len(cl)):
                b = cl[j]
                if b in ra or ra & restricted[b]:
                    continue
                score += 1.0
        out[k - lo] = score
    return out


def dispersion(edges: Dataset) -> Dataset:
    """(src, dst, dispersion) per distinct non-loop directed edge."""
    import pyarrow.compute as pc
    import ray.data as rd

    e = distinct(
        edges.select_columns(["src", "dst"]).map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
    ).materialize()
    if e.count() > LOCAL_EDGE_THRESHOLD:
        raise NotImplementedError(
            "dispersion gathers the edge list (reference parity: "
            "CompactUndirectedGraph is per-executor in-memory); restrict the "
            "edge bundle first above LOCAL_EDGE_THRESHOLD"
        )
    ss, dd = [], []
    for b in e.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        ss.append(b["src"].to_numpy())
        dd.append(b["dst"].to_numpy())
    if not ss:
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "dispersion": pa.array([], pa.float64()),
                }
            )
        )
    s = np.concatenate(ss)
    d = np.concatenate(dd)
    vids = np.unique(np.concatenate([s, d]))
    V = len(vids)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    indptr, nbrs = _adj_sets(si, di, V)
    refs = ray.put((indptr, nbrs, si, di))
    chunks = [
        _dispersion_chunk.remote(refs, lo, min(lo + _CHUNK, len(s)))
        for lo in range(0, len(s), _CHUNK)
    ]
    disp = np.concatenate(ray.get(chunks)) if chunks else np.empty(0)
    return rd.from_arrow(pa.table({"src": s, "dst": d, "dispersion": disp}))
