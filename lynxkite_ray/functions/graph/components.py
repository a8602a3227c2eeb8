"""Connected components: iterative min-label propagation with a local
fallback, labels normalized to the minimum vertex id per component.

Reference (ConnectedComponents.scala:35-169) uses randomized host/guest
contraction with a single-task local BFS below 20M edges and is verified by
its own tests only up to relabeling (ConnectedComponentsTest.scala:19-34).
We pin the deterministic normal form — component label = min vertex id —
and compute it directly:

- **local fallback** (edges ≤ context.LOCAL_EDGE_THRESHOLD, mirroring
  maxEdgesProcessedLocally): gather index-space edges, then vectorized
  min-label rounds + pointer jumping (label ← label[label]) to fixpoint.
- **distributed**: synchronous min-label rounds as Dataset ops — per round,
  each edge sends min(label_src, label_dst) both ways, combine with
  groupby(vertex).min, plus pointer-jump rounds (label ⋈ label) to shortcut
  long chains; stop when no label changed (a tiny aggregate).

The undirected view is formed internally (both directions); self-loops are
irrelevant to the result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ...context import LOCAL_EDGE_THRESHOLD, paused_gc
from ...state.checkpoint import CheckpointManager, lineage_key
from .core import Graph


def _cc_local(si: np.ndarray, di: np.ndarray, V: int) -> np.ndarray:
    """Vectorized min-label propagation + pointer jumping on dense indices.
    Returns the component representative *index* per vertex (min index)."""
    label = np.arange(V, dtype=np.int64)
    while True:
        before = label
        # one hop: pull the smaller label across every edge, both directions
        m = np.minimum(label[si], label[di])
        nxt = label.copy()
        np.minimum.at(nxt, si, m)
        np.minimum.at(nxt, di, m)
        # pointer jumping until stable (cheap, O(log) rounds)
        while True:
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        label = nxt
        if np.array_equal(label, before):
            return label


def connected_components_dataset(
    edges,
    num_partitions: int | None = None,
    max_rounds: int = 50,
    vertices=None,
    checkpoint_root: str | None = None,
    job: str = "cc_ds",
):
    """Arbitrary-scale Dataset-only components: labels never leave the
    Dataset plane (the beyond-DENSE_VERTEX_THRESHOLD path).

    Per round: each edge pushes min(label) both ways (hash-shuffled min
    combine), then one pointer-jump round (labels re-keyed through
    themselves — the large-star shortcut that collapses chains in O(log V)
    rounds).  Stops when a round changes nothing.  Returns (id, component)
    with component = min vertex id, identical to the dense path.
    """
    import pyarrow.compute as pc

    from ...context import default_partitions
    from ...stages.edges import add_reversed_edges, vertices_from_edges
    from ...stages.shuffle import grouped_aggregate

    if num_partitions is None:
        num_partitions = default_partitions()
    both = add_reversed_edges(edges).materialize()
    if vertices is None:
        vertices = vertices_from_edges(edges)
    labels = (
        vertices.map_batches(
            lambda t: pa.table({"id": t["id"], "label": t["id"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # distributed per-round checkpoint/resume (same protocol as the dense
    # path, but blocks write straight from the Dataset plane)
    ckpt = None
    start_round = 0
    if checkpoint_root is not None:
        ckpt = CheckpointManager(
            checkpoint_root,
            job,
            "cc-ds",
            lineage_key("cc-ds", both.count(), max_rounds),
        )
        latest = ckpt.latest()
        if latest is not None:
            m = ckpt.manifest(latest)
            if m.get("metrics", {}).get("changed") == 0:
                return ckpt.load_dataset(latest).map_batches(
                    lambda t: pa.table({"id": t["id"], "component": t["label"]}),
                    batch_format="pyarrow",
                )
            labels = ckpt.load_dataset(latest).materialize()
            start_round = latest + 1

    for rnd in range(start_round, max_rounds):
        # hop: neighbor labels pushed along every (src → dst) direction
        msgs = both.join(
            labels.map_batches(
                lambda t: t.rename_columns(["src", "label"]), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
        ).map_batches(
            lambda t: pa.table({"id": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        mins = grouped_aggregate(
            msgs, ["id"], [("label", "min", "nbr_min")], num_partitions
        )
        merged = labels.join(
            mins, join_type="left_outer", num_partitions=num_partitions, on=("id",)
        ).map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"],
                    "label": pc.min_element_wise(
                        t["label"], pc.fill_null(t["nbr_min"], np.iinfo(np.int64).max)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        # pointer jump: label ← label[label]
        jumped = merged.join(
            merged.map_batches(
                lambda t: pa.table({"label": t["id"], "parent": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("label",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"],
                    "label": pc.min_element_wise(
                        t["label"], pc.fill_null(t["parent"], np.iinfo(np.int64).max)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        changed = (
            jumped.join(
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
        labels = jumped
        if ckpt is not None:
            ckpt.save_dataset(rnd, labels, {"changed": changed})
        if changed == 0:
            break
    return labels.map_batches(
        lambda t: pa.table({"id": t["id"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def connected_components(
    graph: Graph,
    checkpoint_root: str | None = None,
    job: str = "cc",
):
    """Returns per-vertex component labels (= min vertex id in component),
    aligned with graph.vids.  DatasetGraph handles dispatch to
    ``connected_components_dataset`` and return a Dataset of
    (id, component) instead."""
    if not graph.is_dense:
        return connected_components_dataset(graph.edges, vertices=graph.vertices)
    V = graph.num_vertices
    if graph.num_edges <= LOCAL_EDGE_THRESHOLD:
        si, di, _ = graph.gather_edges()
        idx = _cc_local(si, di, V)
        return graph.vids[idx]

    # Distributed path: synchronous rounds over the pinned shards; state is
    # the dense label vector (V ≤ DENSE_VERTEX_THRESHOLD by Graph contract),
    # broadcast per round; per-shard partial mins are combined on the driver.
    label = np.arange(V, dtype=np.int64)
    ckpt = None
    start_round = 0
    if checkpoint_root is not None:
        ckpt = CheckpointManager(
            checkpoint_root, job, "cc", lineage_key(graph.lineage, "min-label")
        )
        latest = ckpt.latest()
        if latest is not None:
            label = (
                ckpt.load(latest).column("_idx_label").to_numpy(zero_copy_only=False).copy()
            )
            start_round = latest + 1

    @ray.remote
    def shard_min(shard: pa.Table, lab: np.ndarray):
        """Shards are dst-sorted: the di side returns a contiguous range
        *slice* (lo, vec); the scattered si side returns a compacted sparse
        (unique si, per-si min) pair — per-round traffic is O(V + Σ unique
        keys per shard), not O(shards × V) (same fix as _pr_contrib)."""
        si = shard.column("si").to_numpy()
        di = shard.column("di").to_numpy()
        if len(di) == 0:
            e = np.empty(0, np.int64)
            return 0, e, e, e
        m = np.minimum(lab[si], lab[di])
        lo = int(di.min())
        hi = int(di.max()) + 1
        dvec = np.full(hi - lo, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(dvec, di - lo, m)
        order = np.argsort(si, kind="stable")
        s_sorted, m_sorted = si[order], m[order]
        bound = np.empty(len(s_sorted), dtype=bool)
        bound[0] = True
        bound[1:] = s_sorted[1:] != s_sorted[:-1]
        starts = np.flatnonzero(bound)
        return lo, dvec, s_sorted[starts], np.minimum.reduceat(m_sorted, starts)

    rounds = 0
    it = start_round
    with paused_gc():
        while True:
            lab_ref = ray.put(label)
            futures = [shard_min.remote(s, lab_ref) for s in graph.shard_refs]
            nxt = label.copy()
            for lo, dvec, s_u, m_u in ray.get(futures):
                if len(dvec):
                    np.minimum(
                        nxt[lo : lo + len(dvec)], dvec, out=nxt[lo : lo + len(dvec)]
                    )
                if len(s_u):
                    np.minimum.at(nxt, s_u, m_u)
            while True:
                jumped = nxt[nxt]
                if np.array_equal(jumped, nxt):
                    break
                nxt = jumped
            changed = int(np.count_nonzero(nxt != label))
            label = nxt
            if ckpt is not None:
                ckpt.save(
                    it,
                    pa.table(
                        {
                            "id": graph.vids,
                            "component": graph.vids[label],
                            "_idx_label": label,
                        }
                    ),
                    {"changed": changed, "round": rounds},
                )
            it += 1
            rounds += 1
            if changed == 0:
                break
    return graph.vids[label]
