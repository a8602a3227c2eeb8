"""Closeness-family centralities (NetworKit centrality-menu analogs —
reference: GraphComputationOperations.scala:49-108 "Compute centrality"
closeness-estimate / lin / average-distance choices, executed by
networkit_compute_double_attribute.go).

NetworKit's estimators are per-source BFS sweeps over an in-memory graph
held by each executor; the Ray shape here is the same: the CSR is
broadcast ONCE (``ray.put``), source ranges fan out as tasks, each task
runs vectorized frontier BFS per source and returns only (reach-count,
distance-sum) per source — O(k·m) total work, nothing O(V²) ships.

At 100-TB link-graph scale the honest contract is the *sampled* one
(pick k ≪ V sources; NetworKit's ApproxCloseness does the same), which
is why every public entry takes an explicit ``sources`` array.  The CSR
broadcast requires the edge list to fit one object — gated by
LOCAL_EDGE_THRESHOLD like the other NetworKit-parity local ops
(dispersion, cliques); the fully-distributed alternative for per-vertex
distance profiles is hyperball.py (HyperBall sketches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from .core import Graph

_SRC_CHUNK = 64


def _csr(si: np.ndarray, di: np.ndarray, V: int):
    order = np.argsort(si, kind="stable")
    si, di = si[order], di[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(si, minlength=V), out=indptr[1:])
    return indptr, di


@ray.remote
def _bfs_stats_chunk(csr, src_idx: np.ndarray, V: int):
    """Per-source (reach incl. self, Σdist, eccentricity) via vectorized
    frontier BFS."""
    indptr, nbrs = csr
    r = np.zeros(len(src_idx), dtype=np.int64)
    sumd = np.zeros(len(src_idx), dtype=np.int64)
    ecc = np.zeros(len(src_idx), dtype=np.int64)
    for k, s in enumerate(src_idx):
        seen = np.zeros(V, dtype=bool)
        seen[s] = True
        frontier = np.array([s], dtype=np.int64)
        d = 0
        nreach, dsum = 1, 0
        while len(frontier):
            starts = indptr[frontier]
            cnt = indptr[frontier + 1] - starts
            total = int(cnt.sum())
            if total == 0:
                break
            pos = np.repeat(starts, cnt) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
            )
            nxt = np.unique(nbrs[pos])
            nxt = nxt[~seen[nxt]]
            if len(nxt) == 0:
                break
            seen[nxt] = True
            d += 1
            nreach += len(nxt)
            dsum += d * len(nxt)
            frontier = nxt
        r[k], sumd[k], ecc[k] = nreach, dsum, d
    return r, sumd, ecc


def source_bfs_stats(
    graph: Graph, sources: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(source_ids, reach_count, dist_sum, eccentricity) — exact BFS from
    each source.

    Broadcast-CSR + source-chunk fan-out; the sampled-estimate scale path
    is the caller passing k ≪ V sources."""
    if graph.num_edges > LOCAL_EDGE_THRESHOLD:
        raise NotImplementedError(
            "closeness-family BFS broadcasts the CSR (NetworKit parity: the "
            "graph is in-memory per executor); above LKR_LOCAL_EDGES use "
            "hyperball.py's distributed distance sketches instead"
        )
    sources = np.asarray(sources, dtype=np.int64)
    src_idx = np.searchsorted(graph.vids, sources)
    V = graph.num_vertices
    ok = (src_idx < V) & (graph.vids[np.clip(src_idx, 0, V - 1)] == sources)
    if not ok.all():
        raise ValueError("source_bfs_stats: source id not in graph")
    si, di, _ = graph.gather_edges()
    csr_ref = ray.put(_csr(si, di, V))
    chunks = [
        src_idx[i : i + _SRC_CHUNK] for i in range(0, len(src_idx), _SRC_CHUNK)
    ]
    parts = ray.get([_bfs_stats_chunk.remote(csr_ref, c, V) for c in chunks])
    r = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, np.int64)
    sumd = (
        np.concatenate([p[1] for p in parts]) if parts else np.zeros(0, np.int64)
    )
    ecc = (
        np.concatenate([p[2] for p in parts]) if parts else np.zeros(0, np.int64)
    )
    return sources, r, sumd, ecc


def closeness_centrality(graph: Graph, sources: np.ndarray) -> Dataset:
    """Wasserman–Faust generalized closeness for each source vertex:
    c(v) = (r-1)²/(Σd·(n-1)) where r counts v's reachable set incl. v —
    the disconnected-graph-safe variant NetworKit normalizes with; 0 for
    vertices that reach nothing."""
    import ray.data as rd

    from ...util import round_away

    ids, r, sumd, _ = source_bfs_stats(graph, sources)
    n = graph.num_vertices
    c = np.zeros(len(ids), dtype=np.float64)
    m = (r > 1) & (sumd > 0)
    c[m] = (r[m] - 1.0) ** 2 / (sumd[m].astype(np.float64) * (n - 1.0))
    return rd.from_arrow(
        pa.table({"id": ids, "closeness": round_away(c, 6)})
    )


def lin_centrality(graph: Graph, sources: np.ndarray) -> Dataset:
    """Lin's index: r²/Σd over the reachable set (r incl. self); vertices
    reaching nothing get 1 (NetworKit convention)."""
    import ray.data as rd

    from ...util import round_away

    ids, r, sumd, _ = source_bfs_stats(graph, sources)
    lin = np.ones(len(ids), dtype=np.float64)
    m = sumd > 0
    lin[m] = (r[m].astype(np.float64) ** 2) / sumd[m]
    return rd.from_arrow(pa.table({"id": ids, "lin": round_away(lin, 6)}))


def average_distance(graph: Graph, sources: np.ndarray) -> Dataset:
    """Mean shortest-path distance over ordered reachable pairs (s, t),
    s ∈ sources, t ≠ s — the sampled average-distance estimate (exact when
    sources = all vertices).  One scalar row."""
    import ray.data as rd

    from ...util import round_away

    _, r, sumd, _ = source_bfs_stats(graph, sources)
    pairs = int((r - 1).sum())
    avg = float(sumd.sum()) / pairs if pairs > 0 else 0.0
    return rd.from_arrow(
        pa.table({"avg_distance": round_away(np.array([avg]), 6)})
    )


def diameter_lower_bound(graph: Graph, sources: np.ndarray) -> Dataset:
    """'Compute diameter' (GraphComputationOperations.scala:184, NetworKit
    Diameter with max_error > 0): max eccentricity over the BFS source
    sample — a certified LOWER bound on the diameter, exact when sources
    = all vertices.  One scalar row (diameter_lower, n_sources)."""
    import ray.data as rd

    _, _, _, ecc = source_bfs_stats(graph, sources)
    return rd.from_arrow(
        pa.table(
            {
                "diameter_lower": np.array(
                    [int(ecc.max()) if len(ecc) else 0], np.int64
                ),
                "n_sources": np.array([len(ecc)], np.int64),
            }
        )
    )


def laplacian_centrality(edges: Dataset, vertices: Dataset) -> Dataset:
    """Unweighted Laplacian centrality (Qi et al. 2012, the NetworKit
    LaplacianCentrality analog): the drop in Laplacian energy when v is
    removed, LC(v) = d(v)² + d(v) + 2·Σ_{u∈N(v)} d(u) over the directed
    edge bundle as given (pass the symmetric bundle for undirected
    semantics).

    Fully Dataset-plane — one degree aggregate, one hash join of the edge
    list against it, one grouped sum: no gather, scales with the edge
    exchange like out_degree."""
    from ...stages.edges import out_degree
    from ...stages.join import hash_join
    from ...stages.shuffle import grouped_aggregate

    deg = out_degree(edges, vertices)  # (id, degree) incl. isolated = 0
    dd = deg.map_batches(
        lambda t: t.rename_columns(["dst", "ndeg"]), batch_format="pyarrow"
    )
    nsum = grouped_aggregate(
        hash_join(edges.select_columns(["src", "dst"]), dd, on=["dst"]),
        ["src"],
        [("ndeg", "sum", "nsum")],
    ).map_batches(
        lambda t: t.rename_columns(["id", "nsum"]), batch_format="pyarrow"
    )

    def combine(t: pa.Table) -> pa.Table:
        d = t.column("degree").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("nsum").to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.where(np.isnan(s), 0.0, s)
        return pa.table(
            {"id": t["id"], "lap": pa.array(d * d + d + 2.0 * s, pa.float64())}
        )

    joined = hash_join(deg, nsum, on=["id"], how="left")
    return joined.map_batches(
        combine, batch_format="pyarrow", zero_copy_batch=True
    )
