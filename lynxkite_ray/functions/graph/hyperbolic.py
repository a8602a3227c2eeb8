"""HyperMap embedding + hyperbolic link prediction (HyperMap.scala:32,
HyperbolicPrediction.scala:41; Papadopoulos et al., arXiv:1205.4384).

Formulas mirror the reference's HyperDistance object
(PSOGenerator.scala:144-200):

    φ(θ1, θ2) = π − |π − |θ1 − θ2||
    d(u, v)   = r_u + r_v + 2·ln(φ/2)
    P(u, v)   = 1 / (1 + exp((d − R_u) / (2T))),  T = 0.45 (the
                reference hard-codes it for prediction)
    R_u       = r_u − 2·ln(2T / sin(Tπ) · I_ord / L_ext)

Pinned divergence (policy as in labelprop.py): the reference's HyperMap
places each vertex by sampled maximum-likelihood over candidate angles
(Random-seeded); our deterministic analog places vertices in descending
degree order at the weighted circular mean of their already-placed
neighbors' angles (hashed uniform when none are placed yet) — the same
popularity/similarity geometry without the stochastic search.  Both ops
gather (V-bounded, same single-node regime as the reference's collect()
at HyperbolicPrediction.scala:86)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD


def _phi(a1: np.ndarray, a2) -> np.ndarray:
    return np.pi - np.abs(np.pi - np.abs(a1 - a2))


def _hyperbolic_distance(r1, a1, r2, a2):
    return r1 + r2 + 2.0 * np.log(np.maximum(_phi(a1, a2), 1e-12) / 2.0)


def _inverse_exponent(ord_: np.ndarray, exponent: float) -> np.ndarray:
    return (1.0 / (1.0 - exponent)) * (1.0 - ord_ ** -(1.0 - exponent))


def _internal_epso(exponent: float, internal: float, n: int, ord_: np.ndarray):
    first = (2.0 * internal * (1.0 - exponent)) / (
        (1.0 - float(n) ** -(1.0 - exponent)) ** 2 * (2.0 * exponent - 1.0)
    )
    second = (n / ord_) ** (2.0 * exponent - 1.0) - 1.0
    third = 1.0 - ord_ ** -(1.0 - exponent)
    return first * second * third


def _gather_edges_local(edges: Dataset):
    ss, dd = [], []
    n = 0
    for b in edges.select_columns(["src", "dst"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        n += len(s)
        if n > LOCAL_EDGE_THRESHOLD:
            raise NotImplementedError(
                "hypermap gathers the graph (single-node, reference parity); "
                "coarsen above LOCAL_EDGE_THRESHOLD"
            )
        ss.append(s)
        dd.append(d)
    s = np.concatenate(ss) if ss else np.empty(0, np.int64)
    d = np.concatenate(dd) if dd else np.empty(0, np.int64)
    keep = s != d
    return s[keep], d[keep]


def hypermap(edges: Dataset, seed: int = 9) -> Dataset:
    """(id, radial, angular) hyperbolic coordinates."""
    import ray.data as rd

    s, d = _gather_edges_local(edges)
    vids = np.unique(np.concatenate([s, d]))
    V = len(vids)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    deg = np.bincount(si, minlength=V) + np.bincount(di, minlength=V)
    # descending degree, tie → smaller id (HyperMap.scala:57-62)
    order = np.lexsort((vids, -deg))
    ord0 = int(np.log(max(V, 2)))
    radial = np.empty(V)
    radial[order] = 2.0 * np.log(np.arange(V) + 1 + ord0)

    # adjacency for the placement pass
    srcs = np.concatenate([si, di])
    dsts = np.concatenate([di, si])
    o2 = np.argsort(srcs, kind="stable")
    srcs, dsts = srcs[o2], dsts[o2]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(srcs, minlength=V), out=indptr[1:])

    h = (
        vids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)
    ) * np.uint64(0xBF58476D1CE4E5B9)
    fallback = ((h >> np.uint64(11)).astype(np.float64) / float(1 << 53)) * 2 * np.pi

    angular = np.zeros(V)
    placed = np.zeros(V, dtype=bool)
    for v in order:
        nb = dsts[indptr[v] : indptr[v + 1]]
        nb = nb[placed[nb]]
        if len(nb) == 0:
            angular[v] = fallback[v]
        else:
            # weighted circular mean, higher-degree (earlier) neighbors count
            # more via 1/radial weights
            wgt = 1.0 / np.maximum(radial[nb], 1e-9)
            ang = np.arctan2(
                (wgt * np.sin(angular[nb])).sum(), (wgt * np.cos(angular[nb])).sum()
            )
            angular[v] = ang % (2 * np.pi)
        placed[v] = True
    return rd.from_arrow(
        pa.table(
            {
                "id": vids,
                "radial": np.round(radial, 9),
                "angular": np.round(angular, 9),
            }
        )
    )


def hyperbolic_prediction(
    coords: Dataset,
    size: int = 100,
    external_degree: float = 1.5,
    internal_degree: float = 1.5,
    exponent: float = 0.6,
) -> Dataset:
    """Top-``size`` most probable non-observed links from hyperbolic
    coordinates (both directions emitted with the probability attribute,
    mirroring HyperbolicPrediction.scala:132-141)."""
    import ray.data as rd

    rows = []
    for b in coords.select_columns(["id", "radial", "angular"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        rows.append(b)
    t = pa.concat_tables(rows)
    ids = t.column("id").to_numpy()
    rad = t.column("radial").to_numpy(zero_copy_only=False).astype(np.float64)
    ang = t.column("angular").to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(ids)
    if n < 2:
        e = np.empty(0, np.int64)
        return rd.from_arrow(
            pa.table({"src": e, "dst": e, "probability": np.empty(0)})
        )
    # ord by radial ascending (HyperbolicPrediction.scala:63-67)
    order = np.lexsort((ids, rad))
    ord_ = np.empty(n, dtype=np.float64)
    ord_[order] = np.arange(1, n + 1)
    exp_deg = external_degree + _internal_epso(exponent, internal_degree, n, ord_)
    T = 0.45
    R = rad - 2.0 * np.log(
        (2.0 * T / np.sin(T * np.pi)) * _inverse_exponent(ord_, exponent) / external_degree
    )

    # candidates: ~log(n)·expectedDegree angularly-nearest per vertex
    aorder = np.argsort(ang, kind="stable")
    logn = max(int(np.log(n)), 1)
    out_s, out_d, out_p = [], [], []
    for pos in range(n):
        v = aorder[pos]
        k = max(int(logn * exp_deg[v]), 1)
        offs = np.arange(1, min(k, n - 1) + 1)
        cand = aorder[(pos + np.concatenate([offs, -offs])) % n]
        cand = np.unique(cand[cand != v])
        dist = _hyperbolic_distance(rad[v], ang[v], rad[cand], ang[cand])
        prob = 1.0 / (1.0 + np.exp((dist - R[v]) / (2.0 * T)))
        take = min(max(int(exp_deg[v]), 1), len(cand))
        sel = np.lexsort((ids[cand], -prob))[:take]
        out_s.append(np.full(take, ids[v]))
        out_d.append(ids[cand][sel])
        out_p.append(prob[sel])
    src = np.concatenate(out_s)
    dst = np.concatenate(out_d)
    prob = np.concatenate(out_p)
    top = np.lexsort((dst, src, -prob))[:size]
    src, dst, prob = src[top], dst[top], np.round(prob[top], 9)
    return rd.from_arrow(
        pa.table(
            {
                "src": np.concatenate([src, dst]),
                "dst": np.concatenate([dst, src]),
                "probability": np.concatenate([prob, prob]),
            }
        )
    )
