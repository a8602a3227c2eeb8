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
from ..graph.triangles import (
    _count_bundle,
    _gather_canonical,
    _prepare,
    _triangles_distributed,
)


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


def clustering_coefficient(edges: Dataset, assume_canonical: bool = False) -> Dataset:
    """(id, clustering) over the undirected simple graph, rounded 6
    (half-away, SQL-parity). Degree-<2 vertices get 0.0.  Gated like
    triangle_count: above LOCAL_EDGE_THRESHOLD the Dataset-join path runs
    instead of the driver gather."""
    import ray.data as rd

    canon, csr = _prepare(edges, assume_canonical)
    if csr is None:
        return _clustering_distributed(canon)
    if csr == "empty":
        return rd.from_arrow(
            pa.table({"id": np.empty(0, np.int64), "clustering": np.empty(0, np.float64)})
        )
    _, tri, vids = _count_bundle(csr, per_vertex=True)
    V = csr["V"]
    # degree over the oriented arrays (a, b) — same multiset as (s, d)
    deg = np.bincount(csr["a"], minlength=V) + np.bincount(csr["b"], minlength=V)
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


def reciprocity(edges: Dataset) -> Dataset:
    """One-row (n_edges, n_reciprocal, reciprocity) over the distinct
    directed edge set (loops dropped): the fraction of edges whose reverse
    also exists.  Dataset-plane: distinct → self-join on the swapped key —
    no driver-side edge state (reciprocity is the standard directed-graph
    symmetry scalar; complements RemoveNonSymmetricEdges which RETURNS the
    symmetric subset, stages/edges.py)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ...stages.edges import remove_non_symmetric
    from ...stages.shuffle import distinct

    dedup = distinct(
        edges.map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
    ).materialize()
    n = dedup.count()
    n_rec = remove_non_symmetric(dedup).count()
    frac = float(round_away(np.array([n_rec / n]), 6)[0]) if n else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "n_edges": np.array([n], np.int64),
                "n_reciprocal": np.array([n_rec], np.int64),
                "reciprocity": np.array([frac], np.float64),
            }
        )
    )


def degree_assortativity(edges: Dataset) -> Dataset:
    """One-row Pearson degree-assortativity coefficient of the simple
    undirected graph: corr(deg(u), deg(v)) over both orientations of every
    edge (Newman 2002, public formula).  Dataset-plane shape: degree
    aggregate → two hash joins to attach endpoint degrees → five-moment
    partials combined map-side (same kernel as the Corr aggregate family,
    pipelines/relational.corr_qty_price)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ...context import default_partitions
    from ...stages.edges import add_reversed_edges, canonical_edges

    from ...stages.shuffle import COALESCE_BATCH

    canon = canonical_edges(edges).materialize()
    both = add_reversed_edges(canon).materialize()
    deg = (
        both.groupby("src")
        .aggregate(Count(alias_name="d"))
        .map_batches(
            lambda t: t.rename_columns(["v", "d"]),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        )
    )
    np_parts = default_partitions()
    j = both.join(
        deg, join_type="inner", num_partitions=np_parts, on=("src",), right_on=("v",)
    ).map_batches(
        lambda t: pa.table({"dst": t["dst"], "dx": t["d"]}),
        batch_format="pyarrow",
        batch_size=COALESCE_BATCH,
    )
    j2 = j.join(
        deg, join_type="inner", num_partitions=np_parts, on=("dst",), right_on=("v",)
    )

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("dx").to_numpy().astype(np.float64)
        y = t.column("d").to_numpy().astype(np.float64)
        return pa.table(
            {
                "n": np.array([len(x)], np.int64),
                "sx": np.array([x.sum()], np.float64),
                "sy": np.array([y.sum()], np.float64),
                "sxy": np.array([(x * y).sum()], np.float64),
                "sxx": np.array([(x * x).sum()], np.float64),
                "syy": np.array([(y * y).sum()], np.float64),
            }
        )

    parts = j2.map_batches(moments, batch_format="pyarrow").materialize()
    import ray

    tables = ray.get(parts.to_arrow_refs())
    tot = {k: 0.0 for k in ["n", "sx", "sy", "sxy", "sxx", "syy"]}
    for t in tables:
        for k in tot:
            if t.num_rows:
                tot[k] += float(np.sum(t.column(k).to_numpy()))
    n, sx, sy, sxy, sxx, syy = (
        tot["n"], tot["sx"], tot["sy"], tot["sxy"], tot["sxx"], tot["syy"]
    )
    denom = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    r = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
    from ...util import round_away

    return rd.from_arrow(
        pa.table({"assortativity": round_away(np.array([r]), 6)})
    )


_LP_WEIGHTS = ("adamic_adar", "resource_allocation", "common_neighbors")


def _mid_weight(deg: np.ndarray, weight: str) -> np.ndarray:
    """Per-middle-vertex contribution of the chosen link-prediction index:
    AA = 1/ln(deg), RA = 1/deg (Zhou-Lü-Zhang 2009), CN = 1."""
    w = np.zeros(len(deg), dtype=np.float64)
    multi = deg >= 2
    if weight == "adamic_adar":
        w[multi] = 1.0 / np.log(deg[multi])
    elif weight == "resource_allocation":
        w[multi] = 1.0 / deg[multi]
    elif weight == "common_neighbors":
        w[multi] = 1.0
    else:
        raise ValueError(f"weight must be one of {_LP_WEIGHTS}")
    return w


def _aa_local(
    si: np.ndarray, di: np.ndarray, deg: np.ndarray, V: int,
    weight: str = "adamic_adar",
):
    """Vectorized single-pass link-prediction scores over the dense-index
    simple graph: full undirected CSR → all neighbor pairs per middle via
    the repeat/arange wedge trick (triangles._wedge_chunk pattern) →
    existing edges dropped by sorted-key probe → per-pair sums via
    np.unique inverse.  Returns (a_idx, c_idx, score) for every
    non-adjacent distance-2 pair."""
    # full CSR over both directions, neighbors sorted per vertex
    mids = np.concatenate([si, di])
    nbrs = np.concatenate([di, si])
    order = np.lexsort((nbrs, mids))
    mids, nbrs = mids[order], nbrs[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(mids, minlength=V), out=indptr[1:])
    w = _mid_weight(deg, weight)
    # for every position p (a neighbor x of mid), partners = the later,
    # larger neighbors of the same mid — each unordered pair once
    pos = np.arange(len(nbrs), dtype=np.int64)
    end = indptr[mids + 1]
    cnt = end - pos - 1
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64)
    starts = np.repeat(pos + 1, cnt)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt
    )
    c = nbrs[starts + within]
    a = np.repeat(nbrs, cnt)
    wm = np.repeat(w[mids], cnt)
    keep = a != c  # parallel neighbors can't occur (simple graph), loops can't either
    a, c, wm = a[keep], c[keep], wm[keep]
    lo = np.minimum(a, c)
    hi = np.maximum(a, c)
    key = lo * V + hi
    # drop existing edges (canonical si<di keys, sorted probe)
    ek = np.sort(
        np.minimum(si, di).astype(np.int64) * V + np.maximum(si, di).astype(np.int64)
    )
    p = np.searchsorted(ek, key)
    p[p >= len(ek)] = len(ek) - 1 if len(ek) else 0
    is_edge = ek[p] == key if len(ek) else np.zeros(len(key), bool)
    key, wm, lo, hi = key[~is_edge], wm[~is_edge], lo[~is_edge], hi[~is_edge]
    if len(key) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64)
    uk, inv = np.unique(key, return_inverse=True)
    aa = np.zeros(len(uk), dtype=np.float64)
    np.add.at(aa, inv, wm)
    return (uk // V).astype(np.int64), (uk % V).astype(np.int64), aa


def adamic_adar(
    edges: Dataset, k: int = 100, weight: str = "adamic_adar"
) -> Dataset:
    """Top-k link-prediction candidates over the simple undirected graph:
    for every non-adjacent pair (a, c) at distance 2, score =
    Σ_{w ∈ N(a)∩N(c)} f(deg(w)) with f per ``weight``: Adamic-Adar
    1/ln(deg) (Adamic & Adar 2003), resource allocation 1/deg
    (Zhou-Lü-Zhang 2009), or common neighbors 1 — middle vertices always
    have deg ≥ 2, so the log never vanishes.  Ranked by the
    6-decimal-rounded score (desc, then src, dst asc) so the SQL oracle's
    ROW_NUMBER sees the identical order.  Output column is ``aa``
    regardless of index (one schema for the whole family).

    Dataset shape: wedge enumeration is ONE self-join of the reversed edge
    table on the middle vertex with the middle's 1/ln(deg) attached
    map-side before the join; existing edges drop out via a composite-key
    anti join; one grouped sum then a tiny sort+limit.  Hub middles fan
    out deg² wedges — the same skew surface as triangle counting, handled
    by the hash exchange (a df-cap like JACCARD_MAX_DF is the knob to add
    if a real corpus has 10⁶-degree hubs)."""
    import ray.data as rd

    from ...stages.edges import canonical_edges
    from ...util import round_away

    canon = canonical_edges(edges).materialize()
    # Local vectorized path (one CSR pass, no joins) while the edge list —
    # and the Σdeg² wedge fan-out — fit one worker; the Dataset-join path
    # is the same algebra for the beyond-threshold regime.
    if canon.count() <= LOCAL_EDGE_THRESHOLD:
        s, d = _gather_canonical(canon)
        if len(s):
            vids = np.unique(np.concatenate([s, d]))
            si = np.searchsorted(vids, s)
            di = np.searchsorted(vids, d)
            V = len(vids)
            deg = np.bincount(si, minlength=V) + np.bincount(di, minlength=V)
            # Σdeg² bounds the wedge fan-out; past ~2·10⁸ pairs the local
            # arrays stop being cheap and the join path takes over
            if float(np.square(deg.astype(np.float64)).sum()) <= 2e8:
                a_out, c_out, aa = _aa_local(si, di, deg, V, weight)
                score = round_away(aa, 6)
                order = np.lexsort((vids[c_out], vids[a_out], -score))[:k]
                return rd.from_arrow(
                    pa.table(
                        {
                            "src": vids[a_out][order],
                            "dst": vids[c_out][order],
                            "aa": score[order],
                        }
                    )
                )
    return _aa_dataset(canon, k, weight)


def _aa_dataset(canon: Dataset, k: int, weight: str = "adamic_adar") -> Dataset:
    """Dataset-join link prediction over a canonical simple edge Dataset
    (the beyond-one-worker path of adamic_adar; identical algebra and
    ranking)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from ...context import default_partitions
    from ...stages.edges import add_reversed_edges
    from ...stages.join import anti_join
    from ...stages.shuffle import COALESCE_BATCH
    from ...util import round_away

    both = add_reversed_edges(canon).materialize()
    npart = default_partitions()
    deg = (
        both.groupby("src")
        .aggregate(Count(alias_name="d"))
        .map_batches(
            lambda t: t.rename_columns(["v", "d"]),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        )
    )
    if weight not in _LP_WEIGHTS:
        raise ValueError(f"weight must be one of {_LP_WEIGHTS}")

    def attach_w(t: pa.Table) -> pa.Table:
        d = pc.cast(t["d"], pa.float64())
        if weight == "adamic_adar":
            w = pc.divide(1.0, pc.ln(d))
        elif weight == "resource_allocation":
            w = pc.divide(1.0, d)
        else:
            w = pa.array(np.ones(t.num_rows, dtype=np.float64))
        return pa.table({"mid": t["src"], "c": t["dst"], "w": w})

    right = both.join(
        deg, join_type="inner", num_partitions=npart, on=("src",), right_on=("v",)
    ).map_batches(
        attach_w,
        batch_format="pyarrow",
        batch_size=COALESCE_BATCH,
    )
    left = both.map_batches(
        lambda t: pa.table({"a": t["src"], "mid": t["dst"]}),
        batch_format="pyarrow",
        batch_size=COALESCE_BATCH,
    )
    wedges = left.join(right, join_type="inner", num_partitions=npart, on=("mid",))
    wedges = wedges.map_batches(
        lambda t: pa.table(
            {"src": t["a"], "dst": t["c"], "w": t["w"]}
        ).filter(pc.less(t["a"], t["c"])),
        batch_format="pyarrow",
    )

    # composite key drops pairs that are already edges (ids must fit 31
    # bits each for the fold — true for every driver table; assert cheap)
    def fold(t: pa.Table, s: str, d: str) -> pa.Table:
        a = t.column(s).to_numpy()
        b = t.column(d).to_numpy()
        if len(a) and (a.max() >= (1 << 31) or b.max() >= (1 << 31)):
            raise ValueError("adamic_adar composite key needs ids < 2^31")
        return t.append_column("k", pa.array((a << np.int64(31)) | b))

    wk = wedges.map_batches(lambda t: fold(t, "src", "dst"), batch_format="pyarrow")
    ek = canon.map_batches(
        lambda t: fold(t, "src", "dst").select(["k"]), batch_format="pyarrow"
    )
    cand = anti_join(wk, ek, "k").drop_columns(["k"])
    agg = cand.groupby(["src", "dst"]).aggregate(Sum("w", alias_name="aa"))
    scored = agg.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "aa": round_away(t.column("aa").to_numpy(), 6),
            }
        ),
        batch_format="pyarrow",
    )
    return scored.sort(["aa", "src", "dst"], descending=[True, False, False]).limit(k)
