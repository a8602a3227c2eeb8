"""Synchronous weighted label propagation with a pinned deterministic
tie-break (max neighbor-label weight, ties → smallest label).

The reference delegates to NetworKit PLP (networkit_community_detection.go:
33-37), whose result is iteration-order-dependent; its own help text warns
the outcome is nondeterministic.  Exact-match verification forces us to pin
a deterministic variant (SURVEY §2.1 "Label propagation" row): synchronous
rounds (all vertices update simultaneously from round k−1 labels), a fixed
round count, weighted majority over the undirected neighborhood, smallest
label wins ties.  A vertex with no neighbors keeps its own label.

Dense path only for now: per-shard (dst, label) partial weight sums are
segment-reduced with numpy and merged; per-vertex argmax with the pinned
tie-break.  Per-round checkpoint via state.checkpoint.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ...context import LOCAL_EDGE_THRESHOLD, paused_gc
from ...state.checkpoint import CheckpointManager, lineage_key
from .core import Graph


def _lpa_local(
    si: np.ndarray,
    di: np.ndarray,
    w: np.ndarray,
    V: int,
    iterations: int,
    start_label: np.ndarray | None = None,
) -> np.ndarray:
    """Driver-local synchronous LPA (same pinned semantics as the
    distributed path) — the small-graph fallback mirroring the reference's
    single-machine NetworKit PLP delegation (networkit_community_detection
    .go:33-37).  Below LOCAL_EDGE_THRESHOLD the per-iteration task fan-out
    costs more than the whole numpy loop, so no tasks are launched at all.

    Per iteration the only label-dependent work is one stable (radix) sort
    of the encoded (tgt·V + label) key — the tgt-major layout is fixed up
    front, so the key stream is nearly sorted and the label run combine is
    a reduceat over boundaries."""
    label = (
        np.arange(V, dtype=np.int64) if start_label is None else start_label.copy()
    )
    if len(si) == 0 or V == 0:
        return label
    loop = _LocalLPA(si, di, w, V)
    for _ in range(iterations):
        nxt = loop.step(label)
        if np.array_equal(nxt, label):
            break
        label = nxt
    return label


class _LocalLPA:
    """Per-iteration step for the local fallback.  No up-front edge layout:
    the per-step sort of the packed (tgt·V + label) key already yields
    tgt-major order, so pre-sorting by tgt would be pure overhead (it was —
    one argsort + three gathers at init for no per-step saving).

    The sorts use quicksort, not stable/radix: equal (tgt, label) keys are
    interchangeable (their weights are summed), and int64 radix is 3x slower
    on bandwidth-bound hosts.  The (tgt, label) pair is packed into one key
    (int32 when V² fits) so each iteration is a single-key sort."""

    def __init__(self, si: np.ndarray, di: np.ndarray, w: np.ndarray, V: int):
        tgt = np.concatenate([di, si])
        self.nbr = np.concatenate([si, di])
        self.ww = np.concatenate([w, w])
        self.use32 = V * V < 2**31
        self.tgtV = (tgt * V).astype(np.int32) if self.use32 else tgt * V
        self.V = V

    def step(self, label: np.ndarray) -> np.ndarray:
        V = self.V
        lab = label[self.nbr]
        enc = self.tgtV + (lab.astype(np.int32) if self.use32 else lab)
        order = np.argsort(enc)
        e, x = enc[order], self.ww[order]
        bound = np.empty(len(e), dtype=bool)
        bound[0] = True
        bound[1:] = e[1:] != e[:-1]
        starts = np.flatnonzero(bound)
        sums = np.add.reduceat(x, starts)
        ge = e[starts].astype(np.int64)
        gd = ge // V
        gl = ge - gd * V
        verts, winners = _pick_winners(gd, gl, sums)
        nxt = label.copy()
        nxt[verts] = winners
        return nxt


def _pick_winners(gd: np.ndarray, gl: np.ndarray, sums: np.ndarray) -> tuple:
    """Per-gd argmax over (sums, tie → min gl); inputs are per-(gd, gl)
    combined weights."""
    sel = np.lexsort((gl, -sums, gd))
    gd_s, gl_s = gd[sel], gl[sel]
    first = np.empty(len(gd_s), dtype=bool)
    first[0] = True
    first[1:] = gd_s[1:] != gd_s[:-1]
    return gd_s[first], gl_s[first]


def _pick_labels(di: np.ndarray, lab: np.ndarray, w: np.ndarray, V: int) -> tuple:
    """Segment-reduce (di, lab) → Σw, then per-di argmax (tie → min label).
    Returns (vertex_idx, winning_label) arrays."""
    if len(di) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((lab, di))
    d, l, ww = di[order], lab[order], w[order]
    bound = np.empty(len(d), dtype=bool)
    bound[0] = True
    bound[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(bound)
    sums = np.add.reduceat(ww, starts)
    gd, gl = d[starts], l[starts]
    # winner per gd: sort by (gd, -sums, gl) and take first of each gd run
    sel = np.lexsort((gl, -sums, gd))
    gd_s, gl_s = gd[sel], gl[sel]
    first = np.empty(len(gd_s), dtype=bool)
    first[0] = True
    first[1:] = gd_s[1:] != gd_s[:-1]
    return gd_s[first], gl_s[first]


@ray.remote
def _lp_merge(*parts):
    """Tree-combine level for (tgt, msg, Σw) triples: concatenate a group
    of per-shard partials and re-segment-sum — keeps the per-iteration
    driver merge O(final triples), not O(shards × triples)."""
    tgt = np.concatenate([p[0] for p in parts])
    msg = np.concatenate([p[1] for p in parts])
    ww = np.concatenate([p[2] for p in parts])
    if len(tgt) == 0:
        return tgt, msg, ww
    order = np.lexsort((msg, tgt))
    t, m, x = tgt[order], msg[order], ww[order]
    bound = np.empty(len(t), dtype=bool)
    bound[0] = True
    bound[1:] = (t[1:] != t[:-1]) | (m[1:] != m[:-1])
    starts = np.flatnonzero(bound)
    return t[starts], m[starts], np.add.reduceat(x, starts)


def _lp_tree_combine(futures, branch: int = 8):
    """Driver combine of per-shard (tgt, msg, Σw) partials.  Tree levels
    only past `branch` shards — below that the extra task-wave latency
    exceeds what the tree saves (VERDICT r2 'What's wrong' #1)."""
    level = list(futures)
    while len(level) > branch:
        level = [
            _lp_merge.remote(*level[i : i + branch])
            for i in range(0, len(level), branch)
        ]
    parts = ray.get(level)
    tgt = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    msg = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    ww = np.concatenate([p[2] for p in parts]) if parts else np.empty(0)
    return tgt, msg, ww


@ray.remote
def _lp_messages(shard: pa.Table, lab: np.ndarray):
    """Per-shard partial: undirected messages (neighbor → vertex), combined
    locally to (vertex, label) → Σw triples (map-side combine)."""
    si = shard.column("si").to_numpy()
    di = shard.column("di").to_numpy()
    w = shard.column("w").to_numpy()
    tgt = np.concatenate([di, si])
    msg = np.concatenate([lab[si], lab[di]])
    ww = np.concatenate([w, w])
    if len(tgt) == 0:
        return tgt, msg, ww
    order = np.lexsort((msg, tgt))
    t, m, x = tgt[order], msg[order], ww[order]
    bound = np.empty(len(t), dtype=bool)
    bound[0] = True
    bound[1:] = (t[1:] != t[:-1]) | (m[1:] != m[:-1])
    starts = np.flatnonzero(bound)
    return t[starts], m[starts], np.add.reduceat(x, starts)


def label_propagation_dataset(
    edges,
    iterations: int = 5,
    num_partitions: int | None = None,
    weight_col: str | None = None,
    vertices=None,
):
    """Arbitrary-scale Dataset-only LPA (same pinned semantics): per round,
    neighbor labels flow both directions → (vertex, label) weight sums via
    key shuffle → per-block argmax pick (vertices are block-complete after
    a hash partition by vertex).  Returns (id, label)."""
    import pyarrow.compute as pc

    from ...context import default_partitions
    from ...stages.edges import vertices_from_edges
    from ...stages.shuffle import COALESCE_BATCH, grouped_aggregate, hash_partition

    if num_partitions is None:
        num_partitions = default_partitions()

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        if weight_col is not None:
            w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            w = np.ones(len(s), dtype=np.float64)
        return pa.table(
            {
                "src": np.concatenate([s, d]),
                "dst": np.concatenate([d, s]),
                "w": np.concatenate([w, w]),
            }
        )

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    both = (
        edges.select_columns(cols)
        .map_batches(both_dirs, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    if vertices is None:
        vertices = vertices_from_edges(edges)
    labels = (
        vertices.map_batches(
            lambda t: pa.table({"id": t["id"], "label": t["id"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"id": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        v = t.column("id").to_numpy()
        lab = t.column("label").to_numpy()
        w = t.column("w").to_numpy()
        order = np.lexsort((lab, -w, v))
        v, lab = v[order], lab[order]
        first = np.empty(len(v), dtype=bool)
        first[0] = True
        first[1:] = v[1:] != v[:-1]
        return pa.table({"id": v[first], "label": lab[first]})

    for _ in range(iterations):
        msgs = both.join(
            labels.map_batches(
                lambda t: t.rename_columns(["src", "label"]), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
        ).map_batches(
            lambda t: pa.table(
                {"id": t["dst"], "label": t["label"], "one": t["w"]}
            ),
            batch_format="pyarrow",
        )
        sums = grouped_aggregate(
            msgs, ["id", "label"], [("one", "sum", "w")], num_partitions
        )
        winners = hash_partition(sums, ["id"], num_partitions).map_batches(
            pick,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COALESCE_BATCH,
        )
        nxt = labels.join(
            winners.map_batches(
                lambda t: pa.table({"id": t["id"], "new_label": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("id",),
        ).map_batches(
            lambda t: pa.table(
                {"id": t["id"], "label": pc.coalesce(t["new_label"], t["label"])}
            ),
            batch_format="pyarrow",
        ).materialize()
        changed = (
            nxt.join(
                labels.map_batches(
                    lambda t: pa.table({"id": t["id"], "old": t["label"]}),
                    batch_format="pyarrow",
                ),
                join_type="inner",
                num_partitions=num_partitions,
                on=("id",),
            )
            .map_batches(
                lambda t: t.filter(pc.not_equal(t["label"], t["old"])),
                batch_format="pyarrow",
            )
            .count()
        )
        labels = nxt
        if changed == 0:
            break
    return labels


def label_propagation(
    graph: Graph,
    iterations: int = 5,
    checkpoint_root: str | None = None,
    job: str = "lpa",
):
    """Returns per-vertex community labels (vertex ids), aligned with
    graph.vids. Stops early when a round changes nothing.  DatasetGraph
    handles dispatch to ``label_propagation_dataset`` and return a Dataset
    of (id, label) instead."""
    if not graph.is_dense:
        return label_propagation_dataset(
            graph.edges,
            iterations=iterations,
            weight_col=graph.weight_col,
            vertices=graph.vertices,
        )
    V = graph.num_vertices
    label = np.arange(V, dtype=np.int64)

    ckpt = None
    start = 0
    if checkpoint_root is not None:
        ckpt = CheckpointManager(
            checkpoint_root, job, "lpa", lineage_key(graph.lineage, "sync-lpa", iterations)
        )
        latest = ckpt.latest()
        if latest is not None:
            label = (
                ckpt.load(latest).column("_idx_label").to_numpy(zero_copy_only=False).copy()
            )
            start = latest + 1

    # Small-graph fallback (ConnectedComponents.scala:63-78 philosophy, same
    # gate as connected_components): below LOCAL_EDGE_THRESHOLD the whole
    # numpy loop is cheaper than one round of task fan-out.
    local = None
    if graph.num_edges <= LOCAL_EDGE_THRESHOLD:
        si, di, w = graph.gather_edges()
        local = _LocalLPA(si, di, w, V)

    with paused_gc():
        for it in range(start, iterations):
            if local is not None:
                nxt = local.step(label)
            else:
                lab_ref = ray.put(label)
                futures = [_lp_messages.remote(s, lab_ref) for s in graph.shard_refs]
                tgt, msg, ww = _lp_tree_combine(futures)
                verts, winners = _pick_labels(tgt, msg, ww, V)
                nxt = label.copy()
                nxt[verts] = winners
            changed = int(np.count_nonzero(nxt != label))
            label = nxt
            if ckpt is not None:
                ckpt.save(
                    it,
                    pa.table(
                        {"id": graph.vids, "label": graph.vids[label], "_idx_label": label}
                    ),
                    {"changed": changed},
                )
            if changed == 0:
                break
    return graph.vids[label]
