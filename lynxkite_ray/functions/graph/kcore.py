"""k-core decomposition over the simple undirected graph.

Not present in the reference's operator set — added as a first-class graph
primitive because degeneracy ordering / core filtering is a standard
link-graph cleaning step (e.g. dropping low-core pages before expensive
community detection; Batagelj-Zaversnik peeling semantics).

Semantics: core(v) = the largest k such that v belongs to a maximal
subgraph where every vertex has degree ≥ k.  Loops are dropped and
parallel edges collapsed first (same canonicalization as triangles /
clustering).  Isolated vertices never appear (the edge list defines the
vertex set), matching triangle/embeddedness conventions.

Scale shape:
- local path (≤ LOCAL_EDGE_THRESHOLD canonical edges): one gather, then a
  fully vectorized batched peel — each inner round removes EVERY vertex
  below the current k at once (numpy bincount degree updates), so rounds
  are O(peeled + touched edges), never per-vertex Python.
- Dataset path (above the threshold): `k_core` is the native streaming
  primitive (degree aggregate → broadcast semi-join filter, repeated to a
  fixpoint); `core_number` runs it for k = 1, 2, … recording the vertices
  dropped at each level.  Every round is one groupby + one filter over the
  shrinking edge Dataset — no driver-resident edge state.  The
  partitioning assumption: the per-round low-degree vertex set fits the
  broadcast semi-join cutoff (it shrinks geometrically on power-law
  graphs; the filter falls back to the shuffle semi-join above the cutoff).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ...stages.edges import canonical_edges
from ..graph.triangles import _gather_canonical


def _peel_core_numbers(s: np.ndarray, d: np.ndarray):
    """Vectorized Batagelj-Zaversnik-style batched peel on index arrays.
    Returns (vids, core) for the vertex set of the simple graph."""
    vids = np.unique(np.concatenate([s, d]))
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    V = len(vids)
    deg = np.bincount(si, minlength=V) + np.bincount(di, minlength=V)
    core = np.zeros(V, dtype=np.int64)
    alive = np.ones(V, dtype=bool)
    edge_alive = np.ones(len(si), dtype=bool)
    k = 1
    while alive.any():
        while True:
            rem = alive & (deg < k)
            if not rem.any():
                break
            core[rem] = k - 1
            alive &= ~rem
            em = edge_alive & (rem[si] | rem[di])
            if em.any():
                deg -= np.bincount(si[em], minlength=V)
                deg -= np.bincount(di[em], minlength=V)
                edge_alive &= ~em
        if not alive.any():
            break
        core[alive] = k  # survivors of level k are at least in the k-core
        k += 1
    return vids, core


def _degree_ds(canon: Dataset) -> Dataset:
    from ray.data.aggregate import Count

    from ...stages.edges import add_reversed_edges

    return (
        add_reversed_edges(canon)
        .groupby("src")
        .aggregate(Count(alias_name="deg"))
        .map_batches(
            lambda t: t.rename_columns(["id", "deg"]), batch_format="pyarrow"
        )
    )


def k_core(edges: Dataset, k: int) -> Dataset:
    """The k-core subgraph's edge Dataset (canonical src < dst rows).
    Streaming fixpoint: degree aggregate → drop vertices with deg < k via
    an anti-join filter on both endpoints — repeated until no vertex falls
    below k.  Each round shrinks the edge set monotonically."""
    import pyarrow.compute as pc

    from ...stages.join import anti_join

    canon = canonical_edges(edges).materialize()
    while True:
        deg = _degree_ds(canon)
        low = deg.map_batches(
            lambda t: t.filter(pc.less(t["deg"], k)).select(["id"]),
            batch_format="pyarrow",
        ).materialize()
        if low.count() == 0:
            return canon
        canon = anti_join(
            anti_join(canon, low, "src", key_col="id"), low, "dst", key_col="id"
        ).materialize()


def core_number(edges: Dataset) -> Dataset:
    """(id, core) for every vertex of the simple undirected graph.  Local
    vectorized peel under LOCAL_EDGE_THRESHOLD; above it, iterated k_core
    peeling on the Dataset plane (vertices dropped while raising the bar
    to k carry core = k - 1)."""
    canon = canonical_edges(edges).materialize()
    if canon.count() <= LOCAL_EDGE_THRESHOLD:
        s, d = _gather_canonical(canon)
        if len(s) == 0:
            return rd.from_arrow(
                pa.table({"id": np.empty(0, np.int64), "core": np.empty(0, np.int64)})
            )
        vids, core = _peel_core_numbers(s, d)
        return rd.from_arrow(pa.table({"id": vids, "core": core}))
    return _core_number_dataset(canon)


def _core_number_dataset(canon: Dataset) -> Dataset:
    """Dataset-plane decomposition: for k = 1, 2, … shrink to the k-core;
    every vertex present before but absent after the shrink gets
    core = k - 1.  Terminates when the k-core is empty."""
    from ...stages.join import anti_join

    def vset(e: Dataset) -> Dataset:
        def u(t: pa.Table) -> pa.Table:
            ids = np.unique(
                np.concatenate([t.column("src").to_numpy(), t.column("dst").to_numpy()])
            )
            return pa.table({"id": ids})

        from ...stages.shuffle import distinct

        return distinct(
            e.map_batches(u, batch_format="pyarrow", zero_copy_batch=True), ["id"]
        )

    pieces: list[Dataset] = []
    cur = canon
    cur_v = vset(cur).materialize()
    k = 1
    while cur_v.count() > 0:
        nxt = k_core(cur, k)
        nxt_v = vset(nxt).materialize()
        dropped = anti_join(cur_v, nxt_v, "id").map_batches(
            lambda t, kk=k: t.append_column(
                "core", pa.array(np.full(t.num_rows, kk - 1, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        pieces.append(dropped.materialize())
        cur, cur_v = nxt, nxt_v
        k += 1
    if not pieces:
        return rd.from_arrow(
            pa.table({"id": np.empty(0, np.int64), "core": np.empty(0, np.int64)})
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out
