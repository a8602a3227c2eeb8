"""Forest-fire edge scoring and K-Path centrality (the last two NetworKit
menu analogs — reference: EdgeAttributeOperations.scala:222 "Score edges
with the forest fire model" → ForestFireScore, and
GraphComputationOperations.scala:100 "Compute centrality" k-path →
KPathCentrality, both executed by the networkit_compute_*.go Sphynx
backends).

Both are randomized simulations.  The pinned deterministic variants seed
every independent unit of work by its own index
(``SeedSequence((seed, unit_idx))``), so results are identical across
partitionings, chunk sizes and schedulers; the Ray shape is the usual
NetworKit-parity one — CSR broadcast once, unit ranges fanned out as
tasks (fires and walks are embarrassingly parallel), gated by
LOCAL_EDGE_THRESHOLD like dispersion/cliques.

Forest fire (Leskovec et al. KDD'05 burning process, NetworKit's
ForestFireScore sparsification backend): fires start at a seeded-random
vertex; at each burning vertex the fire keeps jumping to a uniformly
chosen not-yet-burnt neighbor while a Bernoulli(spread_prob) draw
succeeds; every traversal burns the (undirected, canonical) edge.  Fires
run in deterministic rounds of ``fires_per_round`` until total burns ≥
burn_ratio · |E|; the score is per-edge burn count / max burn count.

K-Path (Alahakoon et al. SNS'11 randomized approximation): ``walks``
self-avoiding walks, each from a seeded-uniform start with
seeded-uniform length ℓ ∈ [1, k]; every vertex visited after the start
counts one visit.  κ(v) = k · n · visits(v) / walks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD


def _gather_undirected(edges: Dataset):
    """Canonical (src < dst) dedup edge arrays + sorted vertex ids."""
    import pyarrow.compute as pc

    from ...stages.shuffle import distinct

    canon = distinct(
        edges.select_columns(["src", "dst"]).map_batches(
            lambda t: pa.table(
                {
                    "src": pc.min_element_wise(t["src"], t["dst"]),
                    "dst": pc.max_element_wise(t["src"], t["dst"]),
                }
            ).filter(pc.not_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
    ).materialize()
    if canon.count() > LOCAL_EDGE_THRESHOLD:
        raise NotImplementedError(
            "forest-fire / k-path broadcast the CSR (NetworKit parity: the "
            "graph is in-memory per executor); restrict the bundle first "
            "above LKR_LOCAL_EDGES"
        )
    ss, dd = [], []
    for b in canon.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        ss.append(b["src"].to_numpy())
        dd.append(b["dst"].to_numpy())
    s = np.concatenate(ss) if ss else np.empty(0, np.int64)
    d = np.concatenate(dd) if dd else np.empty(0, np.int64)
    vids = np.unique(np.concatenate([s, d]))
    return s, d, vids


def _csr_with_eids(si: np.ndarray, di: np.ndarray, V: int):
    """Symmetric CSR carrying the canonical edge id on both directions."""
    eid = np.arange(len(si), dtype=np.int64)
    a = np.concatenate([si, di])
    b = np.concatenate([di, si])
    e = np.concatenate([eid, eid])
    order = np.argsort(a, kind="stable")
    a, b, e = a[order], b[order], e[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(a, minlength=V), out=indptr[1:])
    return indptr, b, e


@ray.remote
def _fire_chunk(csr, V: int, m: int, fire_ids: np.ndarray, spread_prob: float):
    """Burn counts per canonical edge for one round's fires."""
    indptr, nbrs, eids = csr
    burns = np.zeros(m, dtype=np.int64)
    for f in fire_ids:
        rng = np.random.default_rng(np.random.SeedSequence((int(f) << 1, 0xF1FE)))
        visited = np.zeros(V, dtype=bool)
        start = int(rng.integers(0, V))
        visited[start] = True
        queue = [start]
        while queue:
            u = queue.pop(0)
            lo, hi = indptr[u], indptr[u + 1]
            if hi == lo:
                continue
            cand = nbrs[lo:hi]
            ce = eids[lo:hi]
            alive = ~visited[cand]
            while alive.any() and rng.random() < spread_prob:
                pick = int(rng.integers(0, int(alive.sum())))
                idx = np.flatnonzero(alive)[pick]
                v = int(cand[idx])
                burns[ce[idx]] += 1
                visited[v] = True
                alive[idx] = False
                queue.append(v)
    return burns


def forest_fire_score(
    edges: Dataset,
    spread_prob: float = 0.5,
    burn_ratio: float = 2.0,
    seed: int = 42,
    fires_per_round: int = 256,
) -> Dataset:
    """(src, dst, forest_fire_score) per canonical undirected edge —
    burn frequency normalized by the max, in [0, 1]."""
    import ray.data as rd

    from ...util import round_away

    si_ids, di_ids, vids = _gather_undirected(edges)
    V = len(vids)
    m = len(si_ids)
    if m == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "forest_fire_score": pa.array([], pa.float64()),
                }
            )
        )
    si = np.searchsorted(vids, si_ids)
    di = np.searchsorted(vids, di_ids)
    csr_ref = ray.put(_csr_with_eids(si, di, V))
    target = burn_ratio * m
    burns = np.zeros(m, dtype=np.int64)
    next_fire = seed * 1_000_003  # fire index space offset by seed
    rounds = 0
    while burns.sum() < target and rounds < 1000:
        chunk = 32
        ids = np.arange(next_fire, next_fire + fires_per_round, dtype=np.int64)
        next_fire += fires_per_round
        parts = ray.get(
            [
                _fire_chunk.remote(csr_ref, V, m, ids[i : i + chunk], spread_prob)
                for i in range(0, len(ids), chunk)
            ]
        )
        burns += np.sum(parts, axis=0)
        rounds += 1
    peak = burns.max()
    score = burns / peak if peak > 0 else burns.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "src": si_ids,
                "dst": di_ids,
                "forest_fire_score": round_away(score.astype(np.float64), 6),
            }
        )
    )


@ray.remote
def _walk_chunk(csr, V: int, walk_ids: np.ndarray, k: int):
    """Visit counts from one chunk of self-avoiding walks."""
    indptr, nbrs, _ = csr
    visits = np.zeros(V, dtype=np.int64)
    for w in walk_ids:
        rng = np.random.default_rng(np.random.SeedSequence((int(w) << 1, 0x5A1C)))
        cur = int(rng.integers(0, V))
        length = int(rng.integers(1, k + 1))
        seen = {cur}
        for _ in range(length):
            lo, hi = indptr[cur], indptr[cur + 1]
            cand = [int(c) for c in nbrs[lo:hi] if int(c) not in seen]
            if not cand:
                break
            cur = cand[int(rng.integers(0, len(cand)))]
            seen.add(cur)
            visits[cur] += 1
    return visits


def k_path_centrality(
    edges: Dataset, k: int = 5, walks: int = 20_000, seed: int = 42
) -> Dataset:
    """(id, kpath) — κ(v) = k·n·visits(v)/walks over seeded self-avoiding
    walks (Alahakoon et al. 2011; NetworKit KPathCentrality analog)."""
    import ray.data as rd

    from ...util import round_away

    si_ids, di_ids, vids = _gather_undirected(edges)
    V = len(vids)
    if V == 0:
        return rd.from_arrow(
            pa.table(
                {"id": pa.array([], pa.int64()), "kpath": pa.array([], pa.float64())}
            )
        )
    si = np.searchsorted(vids, si_ids)
    di = np.searchsorted(vids, di_ids)
    csr_ref = ray.put(_csr_with_eids(si, di, V))
    base = seed * 1_000_003
    chunk = 2048
    ids = np.arange(base, base + walks, dtype=np.int64)
    parts = ray.get(
        [
            _walk_chunk.remote(csr_ref, V, ids[i : i + chunk], k)
            for i in range(0, walks, chunk)
        ]
    )
    visits = np.sum(parts, axis=0)
    kappa = k * V * visits.astype(np.float64) / walks
    return rd.from_arrow(pa.table({"id": vids, "kpath": round_away(kappa, 6)}))
