"""Graph samplers (SampleVertices / CreateSnowballSample / RandomWalkSample,
SURVEY §2.8): seeded, deterministic, partitioning-independent.

RandomWalkSample.scala:41 restarts seeded walks; we pin the exact variant:
``walks_per_seed`` independent walks of ``walk_length`` steps from each
seed, the RNG seeded per (seed_vertex, walk_idx) so results don't depend on
scheduling. Dead ends stop the walk (the reference teleports; either is a
policy — ours is the simpler deterministic one, documented here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .core import Graph
from .metrics import shortest_paths


def _csr_from_graph(graph: Graph):
    si, di, _ = graph.gather_edges()
    V = graph.num_vertices
    order = np.lexsort((di, si))
    si, di = si[order], di[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(si, minlength=V), out=indptr[1:])
    return indptr, di


def random_walk_sample(
    graph: Graph,
    seeds: np.ndarray,
    walk_length: int = 10,
    walks_per_seed: int = 3,
    seed: int = 42,
):
    """Returns (id, visits) Dataset over all visited vertices."""
    import ray.data as rd

    indptr, nbrs = _csr_from_graph(graph)
    V = graph.num_vertices
    visits = np.zeros(V, dtype=np.int64)
    seed_idx = np.searchsorted(graph.vids, np.asarray(seeds, np.int64))
    for s_i in seed_idx:
        for w in range(walks_per_seed):
            rng = np.random.default_rng(
                np.random.SeedSequence((seed, int(graph.vids[s_i]), w))
            )
            cur = int(s_i)
            visits[cur] += 1
            for _ in range(walk_length):
                lo, hi = indptr[cur], indptr[cur + 1]
                if hi == lo:
                    break  # dead end: stop (pinned policy)
                cur = int(nbrs[rng.integers(lo, hi)])
                visits[cur] += 1
    mask = visits > 0
    return rd.from_arrow(
        pa.table({"id": graph.vids[mask], "visits": visits[mask]})
    )


def snowball_sample(graph: Graph, seeds: np.ndarray, radius: int = 2):
    """CreateSnowballSample analog — the ball of ``radius`` hops around the
    seed set (directed; symmetrize first for the undirected ball).
    Returns (id, dist)."""
    import ray.data as rd

    dist = shortest_paths(graph, np.asarray(seeds, np.int64), max_iterations=radius)
    mask = np.isfinite(dist)
    return rd.from_arrow(
        pa.table(
            {"id": graph.vids[mask], "dist": dist[mask].astype(np.int64)}
        )
    )
