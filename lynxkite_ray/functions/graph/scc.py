"""Strongly connected components of a directed graph.

Beyond the reference's operator set (LynxKite ships undirected CC only) —
added because SCC is the standard web-link-graph primitive (the Broder
bowtie decomposition of a crawl starts here).  Label = min vertex id in
the SCC, mirroring the undirected CC convention.

Scale shape:
- local path (≤ SCC_LOCAL_EDGES distinct edges): one gather, iterative
  Tarjan with explicit stacks — O(V+E), exact, single pass.
- Dataset path: min-label forward/backward coloring (Orzan-style
  phases, public algorithm family).  Per phase, two directed min-reach
  fixpoints run entirely on the Dataset plane (join + grouped-min per
  round, the connected_components_dataset message shape restricted to one
  direction); every vertex whose forward and backward minima agree is in
  the SCC of that pivot and retires with that label; survivors iterate on
  the shrunken edge set.  Each phase retires at least the SCC of every
  currently-minimal pivot, so phases ≤ the condensation's level count.
  Directed reachability admits no pointer-jump shortcut, so inner rounds
  scale with the remaining graph's depth — the documented cost of exact
  distributed SCC.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD

SCC_LOCAL_EDGES = min(2_000_000, LOCAL_EDGE_THRESHOLD)


def _tarjan_min_labels(indptr: np.ndarray, indices: np.ndarray, V: int) -> np.ndarray:
    """Iterative Tarjan; returns per-vertex min-dense-index SCC label."""
    UNSEEN = -1
    index = np.full(V, UNSEEN, dtype=np.int64)
    low = np.zeros(V, dtype=np.int64)
    onstack = np.zeros(V, dtype=bool)
    comp = np.full(V, UNSEEN, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(V):
        if index[root] != UNSEEN:
            continue
        work = [(root, indptr[root])]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        onstack[root] = True
        while work:
            v, ei = work[-1]
            advanced = False
            while ei < indptr[v + 1]:
                w = int(indices[ei])
                ei += 1
                if index[w] == UNSEEN:
                    work[-1] = (v, ei)
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    onstack[w] = True
                    work.append((w, indptr[w]))
                    advanced = True
                    break
                if onstack[w] and index[w] < low[v]:
                    low[v] = index[w]
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    onstack[w] = False
                    members.append(w)
                    if w == v:
                        break
                m = np.asarray(members, dtype=np.int64)
                comp[m] = m.min()
            if work:
                u, _ = work[-1]
                if low[v] < low[u]:
                    low[u] = low[v]
    return comp


def _directed_min_fixpoint(
    edges: Dataset, vertices: Dataset, reverse: bool, num_partitions: int,
    max_inner: int,
):
    """f(v) = min over {initial label of u : u reachable from v} along edge
    direction (reverse=False) or against it (reverse=True).  The initial
    label is v's own id unless ``vertices`` already carries an ``f`` column
    (seeded reachability — e.g. 0 on a seed set, so f(v)=0 iff v reaches a
    seed).  Dataset-plane rounds of join + grouped min until unchanged.

    Returns ``(f, converged)``: ``converged`` is False when ``max_inner``
    rounds ran out before the fixpoint — the vector is then TRUNCATED and
    classifying from it mislabels vertices; callers must raise or keep
    iterating, never classify (ADVICE r3, high)."""
    import pyarrow.compute as pc

    from ...stages.shuffle import COALESCE_BATCH, grouped_aggregate

    recv, send = ("src", "dst") if not reverse else ("dst", "src")
    seeded = "f" in vertices.schema().names
    f = vertices.map_batches(
        lambda t: pa.table({"id": t["id"], "f": t["f" if seeded else "id"]}),
        batch_format="pyarrow",
        batch_size=COALESCE_BATCH,
    ).materialize()
    converged = False
    for _ in range(max_inner):
        msgs = edges.join(
            f,
            join_type="inner",
            num_partitions=num_partitions,
            on=(send,),
            right_on=("id",),
        ).map_batches(
            lambda t: pa.table({"id": t[recv], "m": t["f"]}),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        )
        cand = grouped_aggregate(msgs, ["id"], [("m", "min", "m")], num_partitions)
        nxt = f.join(
            cand, join_type="left_outer", num_partitions=num_partitions, on=("id",)
        ).map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"],
                    "f": pc.min_element_wise(
                        t["f"], pc.fill_null(t["m"], np.iinfo(np.int64).max)
                    ),
                    "chg": pc.cast(
                        pc.less(
                            pc.fill_null(t["m"], np.iinfo(np.int64).max), t["f"]
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        ).materialize()
        changed = nxt.sum("chg")
        f = nxt.select_columns(["id", "f"]).materialize()
        if not changed:
            converged = True
            break
    return f, converged


def strongly_connected_components(
    edges: Dataset, max_rounds: int = 50
) -> Dataset:
    """(id, scc) over the distinct directed edge set (loops dropped from
    the edge relation but a vertex is always strongly connected to
    itself).  scc = min vertex id of the component."""
    import pyarrow.compute as pc

    from ...stages.shuffle import distinct

    dedup = distinct(
        edges.map_batches(
            lambda t: t.select(["src", "dst"]).filter(
                pc.not_equal(t["src"], t["dst"])
            ),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
    ).materialize()
    if dedup.count() <= SCC_LOCAL_EDGES:
        return _scc_local(dedup)
    return _scc_dataset(dedup, max_rounds)


def _scc_local(dedup: Dataset) -> Dataset:
    from ..graph.triangles import _gather_canonical

    s, d = _gather_canonical(dedup)
    if len(s) == 0:
        return rd.from_arrow(
            pa.table({"id": np.empty(0, np.int64), "scc": np.empty(0, np.int64)})
        )
    vids = np.unique(np.concatenate([s, d]))
    V = len(vids)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    order = np.lexsort((di, si))
    si, di = si[order], di[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(si, minlength=V), out=indptr[1:])
    comp = _tarjan_min_labels(indptr, di, V)
    return rd.from_arrow(pa.table({"id": vids, "scc": vids[comp]}))


def _scc_dataset(dedup: Dataset, max_rounds: int) -> Dataset:
    import pyarrow.compute as pc

    from ...context import default_partitions
    from ...stages.edges import vertices_from_edges
    from ...stages.join import anti_join, semi_join
    from ...stages.shuffle import COALESCE_BATCH

    num_partitions = default_partitions()
    cur_edges = dedup
    cur_v = vertices_from_edges(dedup).materialize()
    pieces: list[Dataset] = []
    for _ in range(max_rounds):
        if cur_v.count() == 0:
            break
        fwd, f_ok = _directed_min_fixpoint(
            cur_edges, cur_v, reverse=False, num_partitions=num_partitions,
            max_inner=max_rounds,
        )
        bwd, b_ok = _directed_min_fixpoint(
            cur_edges, cur_v, reverse=True, num_partitions=num_partitions,
            max_inner=max_rounds,
        )
        if not (f_ok and b_ok):
            # classifying from a truncated reach vector would retire
            # vertices with WRONG labels (f==b can hold at a non-minimal
            # label when the SCC's directed diameter exceeds max_rounds)
            raise RuntimeError(
                "strongly_connected_components: directed min-reach fixpoint "
                f"did not converge within {max_rounds} inner rounds; raise "
                "max_rounds (the remaining graph's directed diameter exceeds it)"
            )
        bwd = bwd.map_batches(
            lambda t: t.rename_columns(["id", "b"]),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        )
        lab = fwd.join(
            bwd, join_type="inner", num_partitions=num_partitions, on=("id",)
        )
        assigned = lab.map_batches(
            lambda t: pa.table({"id": t["id"], "scc": t["f"]}).filter(
                pc.equal(t["f"], t["b"])
            ),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        ).materialize()
        pieces.append(assigned)
        remaining = lab.map_batches(
            lambda t: pa.table({"id": t["id"]}).filter(
                pc.not_equal(t["f"], t["b"])
            ),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        ).materialize()
        if remaining.count() == 0:
            cur_v = remaining
            break
        # re-coalesce with an explicit batch_size: semi_join's internal maps
        # can re-emit empty blocks schema-less, which breaks the next
        # phase's joins (the map-feeding-a-join rule)
        cur_edges = (
            semi_join(
                semi_join(cur_edges, remaining, "src", key_col="id"),
                remaining,
                "dst",
                key_col="id",
            )
            .map_batches(
                lambda t: t.select(["src", "dst"]),
                batch_format="pyarrow",
                batch_size=COALESCE_BATCH,
            )
            .materialize()
        )
        # remaining vertices whose every path to/from their old pivot went
        # through retired vertices may now be edge-less: singleton SCCs.
        # Retiring them here both finishes them in O(1) and keeps the next
        # phase's joins off empty edge Datasets.
        if cur_edges.count() == 0:
            pieces.append(
                remaining.map_batches(
                    lambda t: pa.table({"id": t["id"], "scc": t["id"]}),
                    batch_format="pyarrow",
                    batch_size=COALESCE_BATCH,
                ).materialize()
            )
            cur_v = remaining.limit(0).materialize()
            break
        ev = vertices_from_edges(cur_edges).materialize()
        isolated = anti_join(remaining, ev, "id").map_batches(
            lambda t: pa.table({"id": t["id"], "scc": t["id"]}),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        ).materialize()
        if isolated.count():
            pieces.append(isolated)
        cur_v = ev
    if cur_v.count() > 0:  # pragma: no cover - max_rounds exhausted
        raise RuntimeError(
            "strongly_connected_components: max_rounds exhausted before "
            "convergence; raise max_rounds"
        )
    if not pieces:
        return rd.from_arrow(
            pa.table({"id": np.empty(0, np.int64), "scc": np.empty(0, np.int64)})
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out
