"""Per-vertex structural metrics: exact clustering coefficient and
single-source/multi-source shortest paths.

ClusteringCoefficient.scala:77-129 computes cc(v) = triangles(v) /
(deg(v)·(deg(v)−1)/2) over the simple undirected graph (loops dropped,
parallel edges collapsed); vertices with degree < 2 get 0.  We reuse the
oriented-CSR triangle machinery (triangles.py) for the numerator and the
canonical degree for the denominator.

ShortestPath.scala:19-90 is iterative distance relaxation from a starting
set with a max-iteration bound; distances are hop counts when no weight is
given.  Dense path: per-round numpy relaxation over the index-space edge
shards (same broadcast pattern as PageRank); unreachable vertices are
omitted (the reference leaves the attribute undefined for them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ...util import round_away
from ..graph.triangles import _count_csr, _gather_canonical, _triangles_distributed
from ...stages.edges import canonical_edges


def _clustering_distributed(canon: Dataset, num_partitions: int | None = None) -> Dataset:
    """Arbitrary-scale clustering coefficient: per-vertex triangle counts
    from the Dataset wedge-closure path, degree from a count aggregate,
    joined — the edge list never touches the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ...context import default_partitions
    from ...stages.edges import add_reversed_edges

    if num_partitions is None:
        num_partitions = default_partitions()
    deg = (
        add_reversed_edges(canon)
        .groupby("src")
        .aggregate(Count(alias_name="deg"))
        .map_batches(lambda t: t.rename_columns(["id", "deg"]), batch_format="pyarrow")
    )
    tri = _triangles_distributed(canon, per_vertex=True, num_partitions=num_partitions)
    joined = deg.join(tri, join_type="left_outer", num_partitions=num_partitions, on=("id",))

    def cc(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        tr = pc.fill_null(t.column("triangles"), 0).to_numpy(zero_copy_only=False)
        denom = d * (d - 1) / 2.0
        out = np.zeros(len(d))
        nz = denom > 0
        out[nz] = tr[nz] / denom[nz]
        return pa.table({"id": t.column("id"), "clustering": round_away(out, 6)})

    return joined.map_batches(cc, batch_format="pyarrow")


def clustering_coefficient(edges: Dataset) -> Dataset:
    """(id, clustering) over the undirected simple graph, rounded 6
    (half-away, SQL-parity). Degree-<2 vertices get 0.0.  Gated like
    triangle_count: above LOCAL_EDGE_THRESHOLD the Dataset-join path runs
    instead of the driver gather."""
    import ray.data as rd

    canon = canonical_edges(edges).materialize()
    if canon.count() > LOCAL_EDGE_THRESHOLD:
        return _clustering_distributed(canon)
    s, d = _gather_canonical(canon)
    if len(s) == 0:
        return rd.from_arrow(
            pa.table({"id": np.empty(0, np.int64), "clustering": np.empty(0, np.float64)})
        )
    _, tri, vids = _count_csr(s, d, per_vertex=True)
    V = len(vids)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    deg = np.bincount(si, minlength=V) + np.bincount(di, minlength=V)
    denom = deg.astype(np.float64) * (deg - 1) / 2.0
    cc = np.zeros(V, dtype=np.float64)
    nz = denom > 0
    cc[nz] = tri[nz] / denom[nz]
    return rd.from_arrow(pa.table({"id": vids, "clustering": round_away(cc, 6)}))


@ray.remote
def _sp_relax(shard: pa.Table, dist: np.ndarray):
    """Shards are dst-sorted → return only the local dst-range slice
    (lo, vec), O(V) total combine per round instead of O(shards × V)."""
    si = shard.column("si").to_numpy()
    di = shard.column("di").to_numpy()
    w = shard.column("w").to_numpy()
    if len(di) == 0:
        return 0, np.zeros(0)
    lo = int(di.min())
    hi = int(di.max()) + 1
    cand = dist[si] + w
    out = np.full(hi - lo, np.inf)
    np.minimum.at(out, di - lo, cand)
    return lo, out


def shortest_paths(graph, sources: np.ndarray, max_iterations: int = 30) -> np.ndarray:
    """Multi-source shortest path over a Graph handle (directed, weighted
    by the graph's edge weights; hop counts when built unweighted).
    Returns distances aligned with graph.vids (np.inf = unreachable)."""
    V = graph.num_vertices
    dist = np.full(V, np.inf)
    src_idx = np.searchsorted(graph.vids, sources)
    ok = (src_idx < V) & (graph.vids[np.clip(src_idx, 0, V - 1)] == sources)
    dist[src_idx[ok]] = 0.0
    for _ in range(max_iterations):
        dref = ray.put(dist)
        futures = [_sp_relax.remote(s, dref) for s in graph.shard_refs]
        nxt = dist.copy()
        for lo, vec in ray.get(futures):
            if len(vec):
                np.minimum(nxt[lo : lo + len(vec)], vec, out=nxt[lo : lo + len(vec)])
        if np.array_equal(
            np.nan_to_num(nxt, posinf=-1), np.nan_to_num(dist, posinf=-1)
        ):
            break
        dist = nxt
    return dist
