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

import os

import numpy as np
import pyarrow as pa
import ray

from ...context import num_iter_shards, paused_gc
from ...state.checkpoint import CheckpointManager, lineage_key
from .core import Graph

# Below this many edges one driver-local numpy loop beats any task fan-out
# (a single _lpa_step_shard wave costs ~30-50ms in scheduling alone).
LPA_LOCAL_EDGES = int(os.environ.get("LKR_LPA_LOCAL_EDGES", 200_000))


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


@ray.remote
def _lpa_hist_tgt(shard: pa.Table, V: int, bins: int):
    """Coarse histogram of message targets (both edge endpoints) for the
    skew-aware tgt-range boundaries of the LPA layout."""
    si = shard.column("si").to_numpy()
    di = shard.column("di").to_numpy()
    if len(si) == 0:
        return np.zeros(bins, np.int64)
    tgt = np.concatenate([di, si])
    idx = (tgt * bins) // max(V, 1)
    return np.bincount(np.clip(idx, 0, bins - 1), minlength=bins)


@ray.remote
def _lpa_split(shard: pa.Table, bounds: np.ndarray):
    """Double a di-range edge shard into undirected (tgt, nbr, w) messages
    and route them into tgt-range buckets (one pass, same shape as
    core._split_block)."""
    nb = len(bounds) + 1
    si = shard.column("si").to_numpy()
    di = shard.column("di").to_numpy()
    w = shard.column("w").to_numpy()
    tgt = np.concatenate([di, si])
    nbr = np.concatenate([si, di])
    ww = np.concatenate([w, w])
    idx = np.searchsorted(bounds, tgt, side="right")
    order = np.argsort(idx, kind="stable")
    tgt, nbr, ww, idx = tgt[order], nbr[order], ww[order], idx[order]
    counts = np.bincount(idx, minlength=nb)
    offs = np.concatenate(([0], np.cumsum(counts)))
    out = tuple(
        pa.table(
            {
                "tgt": tgt[offs[b] : offs[b + 1]],
                "nbr": nbr[offs[b] : offs[b + 1]],
                "w": ww[offs[b] : offs[b + 1]],
            }
        )
        for b in range(nb)
    )
    return out if nb > 1 else out[0]


@ray.remote
def _lpa_assemble(*parts: pa.Table):
    """Concatenate one tgt-range bucket's slices and sort by tgt so the
    per-iteration step's packed-key sort degenerates to intra-segment
    label ordering."""
    tables = [p for p in parts if p.num_rows]
    if not tables:
        e = np.empty(0, np.int64)
        return pa.table({"tgt": e, "nbr": e, "w": np.empty(0)})
    tgt = np.concatenate([t.column("tgt").to_numpy() for t in tables])
    nbr = np.concatenate([t.column("nbr").to_numpy() for t in tables])
    w = np.concatenate([t.column("w").to_numpy() for t in tables])
    order = np.argsort(tgt, kind="stable")
    return pa.table({"tgt": tgt[order], "nbr": nbr[order], "w": w[order]})


@ray.remote
def _lpa_step_shard(shard: pa.Table, lab: np.ndarray):
    """One LPA round for one tgt-range shard, combined TO COMPLETION in the
    task: every message for a tgt in this range lives in this shard, so the
    returned (verts, winners) are final — the driver just scatters them.
    Replaces the (tgt, msg, Σw)-triple tree combine whose driver-side merge
    dominated per-iteration time (VERDICT r2 'What's wrong' #1)."""
    tgt = shard.column("tgt").to_numpy()
    if len(tgt) == 0:
        e = np.empty(0, np.int64)
        return e, e
    nbr = shard.column("nbr").to_numpy()
    ww = shard.column("w").to_numpy()
    V = len(lab)
    lo = int(tgt[0])
    # local-offset pack keeps (span × V) well inside int64 for any V the
    # dense path admits (V ≤ DENSE_VERTEX_THRESHOLD = 1e8 → ≤ 1e16)
    enc = (tgt - lo) * V + lab[nbr]
    order = np.argsort(enc)
    e, x = enc[order], ww[order]
    bound = np.empty(len(e), dtype=bool)
    bound[0] = True
    bound[1:] = e[1:] != e[:-1]
    starts = np.flatnonzero(bound)
    sums = np.add.reduceat(x, starts)
    ge = e[starts]
    gd = ge // V
    gl = ge - gd * V
    verts, winners = _pick_winners(gd + lo, gl, sums)
    return verts, winners


def _lpa_layout(graph: Graph) -> list:
    """tgt-major doubled-edge shards for the dense iteration loop, built
    once per Graph with a single histogram-bucketed exchange (the same
    pattern as Graph.from_edges' di-range layout) and cached on the
    handle — every subsequent label_propagation call reuses it."""
    cached = getattr(graph, "_lpa_shards", None)
    if cached is not None:
        return cached
    block_refs = list(graph.shard_refs)
    V = graph.num_vertices
    nshards = num_iter_shards(2 * graph.num_edges)
    if nshards <= 1 or not block_refs:
        refs = (
            [
                _lpa_assemble.remote(
                    *[_lpa_split.remote(r, np.empty(0, np.int64)) for r in block_refs]
                )
            ]
            if block_refs
            else []
        )
    else:
        bins = int(min(8192, max(V, 1)))
        hist = np.sum(
            ray.get([_lpa_hist_tgt.remote(r, V, bins) for r in block_refs]), axis=0
        )
        cum = np.cumsum(hist)
        targets = cum[-1] * np.arange(1, nshards) / nshards
        bidx = np.searchsorted(cum, targets)
        bounds = ((bidx + 1) * V) // bins  # tgt < bounds[k] → shard ≤ k
        splits = [
            _lpa_split.options(num_returns=nshards).remote(r, bounds)
            for r in block_refs
        ]
        refs = [
            _lpa_assemble.remote(*[s[b] for s in splits]) for b in range(nshards)
        ]
    graph._lpa_shards = refs
    return refs


def label_propagation_dataset(
    edges,
    iterations: int = 5,
    num_partitions: int | None = None,
    weight_col: str | None = None,
    vertices=None,
    checkpoint_root: str | None = None,
    job: str = "lpa_ds",
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

    ckpt = None
    start_round = 0
    if checkpoint_root is not None:
        ckpt = CheckpointManager(
            checkpoint_root,
            job,
            "lpa-ds",
            lineage_key("lpa-ds", both.count(), iterations, weight_col),
        )
        latest = ckpt.latest()
        if latest is not None:
            labels = ckpt.load_dataset(latest).materialize()
            start_round = latest + 1

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

    for rnd in range(start_round, iterations):
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
        if ckpt is not None:
            ckpt.save_dataset(rnd, labels, {"changed": changed})
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

    # Small-graph fallback (ConnectedComponents.scala:63-78 philosophy):
    # below LPA_LOCAL_EDGES the whole numpy loop is cheaper than one round
    # of task fan-out.  Above it, the tgt-major shard layout (built once,
    # cached on the Graph) lets every round finish inside the tasks.
    local = None
    lpa_refs = None
    if graph.num_edges <= LPA_LOCAL_EDGES:
        si, di, w = graph.gather_edges()
        local = _LocalLPA(si, di, w, V)
    else:
        lpa_refs = _lpa_layout(graph)

    with paused_gc():
        for it in range(start, iterations):
            if local is not None:
                nxt = local.step(label)
            else:
                lab_ref = ray.put(label)
                futures = [_lpa_step_shard.remote(s, lab_ref) for s in lpa_refs]
                nxt = label.copy()
                # tgt ranges are disjoint → scatters never collide
                for verts, winners in ray.get(futures):
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
