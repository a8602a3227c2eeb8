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


@ray.remote
def _pso_range(lo: int, hi: int, r: np.ndarray, theta: np.ndarray, m: int, beta: float):
    """Edges for nodes [lo, hi): each node t connects to the m
    hyperbolically closest earlier nodes (popularity × similarity
    optimization, Papadopoulos et al. 2012).  Earlier-node radii are drifted
    r_s(t) = beta·r_s + (1−beta)·r_t (popularity fading), distance
    x = r_s(t) + r_t + ln(Δθ/2) — all vectorized per node."""
    out_src, out_dst = [], []
    for t in range(lo, hi):
        if t == 0:
            continue
        k = min(m, t)
        rs = beta * r[:t] + (1.0 - beta) * r[t]
        dth = np.abs(theta[:t] - theta[t])
        dth = np.minimum(dth, 2 * np.pi - dth)
        x = rs + r[t] + np.log(np.maximum(dth, 1e-12) / 2.0)
        sel = np.argpartition(x, k - 1)[:k] if k < t else np.arange(t)
        # deterministic order: by (distance, id)
        sel = sel[np.lexsort((sel, x[sel]))][:k]
        out_src.extend([t] * len(sel))
        out_dst.extend(sel.tolist())
    return pa.table(
        {
            "src": pa.array(out_src, pa.int64()),
            "dst": pa.array(out_dst, pa.int64()),
        }
    )


def pso_edges(n_vertices: int, m: int = 2, beta: float = 0.5, seed: int = 3,
              chunk: int = 2_000):
    """PSOGenerator.scala:49 / HyperMap.scala:32 analog: hyperbolic
    popularity × similarity graph.  Radii are the deterministic
    r_t = 2·ln(t+1); angles come from hashed uniforms, so every edge is a
    pure function of (seed, node index) — node ranges generate in parallel
    against one broadcast (r, θ) pair (O(V) driver state, same regime as
    the dense Graph handle).  Produces the model's power-law degrees +
    high clustering."""
    import ray.data as rd

    t_idx = np.arange(n_vertices, dtype=np.float64)
    r = 2.0 * np.log(t_idx + 1.0)
    h = (
        (np.arange(n_vertices, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         + np.uint64(seed))
        * np.uint64(0xBF58476D1CE4E5B9)
    )
    theta = ((h >> np.uint64(11)).astype(np.float64) / float(1 << 53)) * 2 * np.pi
    r_ref = ray.put(r)
    th_ref = ray.put(theta)
    tasks = [
        _pso_range.remote(lo, min(lo + chunk, n_vertices), r_ref, th_ref, m, beta)
        for lo in range(0, n_vertices, chunk)
    ]
    return rd.from_arrow_refs(tasks)


# 'Import well-known graph dataset' (ImportOperations.scala:455-477): the
# reference fetches Cora/CiteSeer/Karate Club/PubMed through
# torch-geometric (PyTorchGeometricDataset), a network download.  Karate
# Club is a 34-vertex constant (Zachary 1977, public domain) and ships
# embedded; the citation datasets need the download and stay stubbed.
_KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
    (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31),
    (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30),
    (2, 3), (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32),
    (3, 7), (3, 12), (3, 13),
    (4, 6), (4, 10),
    (5, 6), (5, 10), (5, 16),
    (6, 16),
    (8, 30), (8, 32), (8, 33),
    (9, 33),
    (13, 33),
    (14, 32), (14, 33),
    (15, 32), (15, 33),
    (18, 32), (18, 33),
    (19, 33),
    (20, 32), (20, 33),
    (22, 32), (22, 33),
    (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31),
    (25, 31),
    (26, 29), (26, 33),
    (27, 33),
    (28, 31), (28, 33),
    (29, 32), (29, 33),
    (30, 32), (30, 33),
    (31, 32), (31, 33),
    (32, 33),
]

# faction labels after the split (Zachary's ground truth): 0 = Mr. Hi,
# 1 = Officer — the 'y' attribute the reference op exposes
_KARATE_OFFICER = {9, 14, 15, 18, 20, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33}


def well_known_graph(name: str):
    """Returns (vertices Dataset (id, y), edges Dataset (src, dst)) for a
    named public dataset — ImportOperations.scala:455-477 analog."""
    import pyarrow as pa
    import ray.data as rd

    if name.lower() in ("karate club", "karate", "karate_club"):
        src = [a for a, _ in _KARATE_EDGES]
        dst = [b for _, b in _KARATE_EDGES]
        vs = rd.from_arrow(
            pa.table(
                {
                    "id": list(range(34)),
                    "y": [1 if i in _KARATE_OFFICER else 0 for i in range(34)],
                }
            )
        )
        es = rd.from_arrow(pa.table({"src": src, "dst": dst}))
        return vs, es
    if name in ("Cora", "CiteSeer", "PubMed"):
        raise NotImplementedError(
            f"{name} is fetched via torch-geometric's Planetoid download "
            "(ImportOperations.scala:455, PyTorchGeometricDataset) — no "
            "network in this container. Karate Club ships embedded."
        )
    raise ValueError(f"unknown well-known dataset {name!r}")
