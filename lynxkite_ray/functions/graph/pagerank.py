"""Weighted PageRank, reference-parity semantics (PageRank.scala:35-91):

- edges with weight ≤ 0 are dropped (PageRank.scala:44; done at Graph build)
- per-src weight normalization: w_norm = w / Σ_src w
- init: pr = 1.0 for every vertex (total mass = N)
- each iteration: incoming[dst] = damping · Σ pr[src]·w_norm
  then pr = (N − Σ incoming)/N + incoming — the uniform term folds both the
  teleport (1−damping) leak and dangling-vertex mass into one redistribution
  (SURVEY §7.5.2; getting this exactly right is what keeps parity ≤ 1e-6)
- fixed iteration count (reference default 5, damping 0.85,
  GraphComputationOperations.scala:386-388); we additionally support an
  early-stop tolerance on max |Δpr| (0 disables → exact reference parity).

Dense path: per-iteration gather-scatter as Ray tasks over the pinned edge
shards — the rank vector is ``ray.put`` once per iteration (broadcast), each
shard task returns a per-shard dense partial (map-side combine via
``np.bincount``), the driver sums partials (Σ over ~E/200k vectors).

Dataset path (``pagerank_dataset``): arbitrary-V streaming variant — hash
join ranks⋈edges on src + groupby(dst).sum per iteration.

Per-iteration checkpointing + resume via state.checkpoint (north rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ...context import paused_gc
from ...state.checkpoint import CheckpointManager, lineage_key
from .core import Graph


@ray.remote
def _pr_contrib(shard: pa.Table, rank: np.ndarray, inv_wdeg: np.ndarray, damping: float, V: int):
    """Per-shard gather-scatter. Shards are dst-sorted, so only the local
    dst-range slice is returned: (lo, subvector)."""
    si = shard.column("si").to_numpy()
    di = shard.column("di").to_numpy()
    w = shard.column("w").to_numpy()
    if len(di) == 0:
        return 0, np.zeros(0)
    lo = int(di.min())
    hi = int(di.max()) + 1
    contrib = damping * rank[si] * inv_wdeg[si] * w
    return lo, np.bincount(di - lo, weights=contrib, minlength=hi - lo)


@ray.remote
def _pr_contrib_group(rank: np.ndarray, inv_wdeg: np.ndarray, damping: float, *shards):
    """Gather-scatter over a GROUP of adjacent dst-range shards, combined
    in shard order inside the task — float-identical to the driver adding
    each shard's slice in the same order, but one task submission + one
    returned slice per group instead of per shard.  Cuts the driver's
    per-iteration serial fraction (submission + result handling), which is
    what bounds low-width scaling (BASELINE.md §3 r5: submission ≈ 40 ms
    of a 107 ms iteration at 8 CPUs before grouping)."""
    parts = []
    for shard in shards:
        si = shard.column("si").to_numpy()
        di = shard.column("di").to_numpy()
        w = shard.column("w").to_numpy()
        if len(di) == 0:
            continue
        lo = int(di.min())
        hi = int(di.max()) + 1
        contrib = damping * rank[si] * inv_wdeg[si] * w
        parts.append((lo, np.bincount(di - lo, weights=contrib, minlength=hi - lo)))
    if not parts:
        return 0, np.zeros(0)
    glo = min(lo for lo, _ in parts)
    ghi = max(lo + len(v) for lo, v in parts)
    out = np.zeros(ghi - glo, dtype=np.float64)
    for lo, v in parts:
        out[lo - glo : lo - glo + len(v)] += v
    return glo, out


def _shard_groups(shard_refs) -> list:
    """Adjacent shards grouped so an iteration submits ~4 tasks per CPU
    (enough slack for balance; far fewer than one task per 200k-row
    shard).  Grouping is a pure scheduling change: shard processing order
    inside a group and group order at the driver both preserve the
    original shard order, so the float result is bit-identical."""
    n = len(shard_refs)
    cpus = int(ray.cluster_resources().get("CPU", 1))
    target = max(1, 4 * cpus)
    g = max(1, (n + target - 1) // target)
    return [shard_refs[i : i + g] for i in range(0, n, g)]


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    iterations: int = 5,
    tol: float = 0.0,
    checkpoint_root: str | None = None,
    job: str = "pagerank",
):
    """Returns the rank vector aligned with ``graph.vids`` (Σ ranks = N).

    DatasetGraph handles (V beyond the dense cap) transparently dispatch to
    ``pagerank_dataset`` and return a Dataset of (id, rank) instead — the
    same formula, never a driver-resident vector (VERDICT r1 item #2)."""
    if not graph.is_dense:
        return pagerank_dataset(
            graph.edges,
            damping=damping,
            iterations=iterations,
            weight_col=graph.weight_col,
            vertices=graph.vertices,
        )
    V = graph.num_vertices
    wdeg = ray.get(graph.wdeg_ref)
    inv_wdeg = np.zeros(V, dtype=np.float64)
    nz = wdeg > 0
    inv_wdeg[nz] = 1.0 / wdeg[nz]
    inv_ref = ray.put(inv_wdeg)

    ckpt = None
    start_iter = 0
    rank = np.ones(V, dtype=np.float64)
    if checkpoint_root is not None:
        lineage = lineage_key(graph.lineage, damping, iterations, tol)
        ckpt = CheckpointManager(checkpoint_root, job, "pagerank", lineage)
        latest = ckpt.latest()
        if latest is not None:
            t = ckpt.load(latest)
            rank = t.column("rank").to_numpy(zero_copy_only=False).copy()
            start_iter = latest + 1
            # A run that early-stopped on tol marks its last checkpoint
            # converged; resuming must NOT apply further iterations or the
            # resumed result diverges bit-wise from the uninterrupted run.
            m = ckpt.manifest(latest) or {}
            if m.get("metrics", {}).get("converged"):
                return rank

    groups = _shard_groups(graph.shard_refs)
    # residual costs two extra O(V) passes per iteration; it only matters
    # for the tol early-stop and the checkpoint manifest
    need_residual = tol > 0 or ckpt is not None
    with paused_gc():
        for it in range(start_iter, iterations):
            rank_ref = ray.put(rank)
            futures = [
                _pr_contrib_group.remote(rank_ref, inv_ref, damping, *grp)
                for grp in groups
            ]
            incoming = np.zeros(V, dtype=np.float64)
            for lo, vec in ray.get(futures):
                # ranges overlap only where one dst id straddles a shard
                # boundary — += keeps those exact
                incoming[lo : lo + len(vec)] += vec
            total_incoming = float(incoming.sum())
            new_rank = (V - total_incoming) / V + incoming
            residual = (
                float(np.max(np.abs(new_rank - rank))) if need_residual and V else 0.0
            )
            rank = new_rank
            converged = tol > 0 and residual < tol
            if ckpt is not None:
                ckpt.save(
                    it,
                    pa.table({"id": graph.vids, "rank": rank}),
                    {
                        "residual": residual,
                        "total_incoming": total_incoming,
                        "converged": converged,
                    },
                )
            if converged:
                break
    return rank


def pagerank_dataset(
    edges,
    damping: float = 0.85,
    iterations: int = 5,
    num_partitions: int | None = None,
    weight_col: str | None = None,
    hub_threshold: int | None = None,
    vertices=None,
    checkpoint_root: str | None = None,
    job: str = "pagerank_ds",
    teleport_sources=None,
):
    """Arbitrary-scale Dataset-only PageRank: no dense vector anywhere.

    ``teleport_sources`` (optional id array) switches to PERSONALIZED
    PageRank: init rank = 1/|S| on the seed set (0 elsewhere, Σrank = 1)
    and each iteration's lost mass re-enters at the seeds instead of
    uniformly — the same per-round algebra as the dense
    ``personalized_pagerank``, teleport applied via a broadcast seed-set
    membership test inside ``map_batches`` (seeds are small by
    assumption; no teleport column rides the joins).

    ranks and edges both live as Datasets; each iteration is
    ranks ⋈ edges (hash join on src) → map_batches(contrib) →
    key-shuffled sum by dst → left join onto the vertex set → uniform
    term.  The scalar Σincoming is a tiny aggregate.  ~2 shuffles per
    iteration; the dense path above avoids both, which is why it's
    preferred whenever the vertex *ids* fit in memory.  Semantics
    identical (same formula).

    **Skew**: when ``hub_threshold`` is set (default: the engine's
    HUB_DEGREE_THRESHOLD when any key exceeds it), edges whose src has
    more than that many out-edges take the HybridRDD broadcast path
    (PageRank.scala:60-67 uses the same split): hub ranks — a bounded-
    small set by construction — are broadcast each iteration and looked
    up inside map_batches; only the low-degree side pays the rank⋈edge
    hash join, so no partition ever holds a hot key's full row set.
    """
    import ray.data as rd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ...context import HUB_DEGREE_THRESHOLD, default_partitions
    from ...stages.edges import vertices_from_edges, weighted_out_degree

    if num_partitions is None:
        num_partitions = default_partitions()
    if hub_threshold is None:
        hub_threshold = HUB_DEGREE_THRESHOLD
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    edges = edges.select_columns(cols)
    if weight_col is None:
        edges = edges.map_batches(
            lambda t: t.append_column(
                "weight", pa.array(np.ones(t.num_rows, dtype=np.float64))
            ),
            batch_format="pyarrow",
        )
        weight_col = "weight"
    else:
        edges = edges.map_batches(
            lambda t: t.filter(pc.greater(t[weight_col], 0.0)), batch_format="pyarrow"
        )

    if vertices is None:
        vertices = vertices_from_edges(edges)
    vertices = vertices.materialize()
    N = vertices.count()

    seed_ref, tshare = None, 0.0
    if teleport_sources is not None:
        cand = pa.array(np.unique(np.asarray(teleport_sources, np.int64)))
        present = vertices.map_batches(
            lambda t, c=cand: t.filter(pc.is_in(t["id"], value_set=c)),
            batch_format="pyarrow",
        )
        parts = [
            b["id"].to_numpy()
            for b in present.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ]
        seeds = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        if len(seeds) == 0:
            raise ValueError("pagerank_dataset: no teleport source id found in graph")
        seed_ref = ray.put(seeds)
        tshare = 1.0 / len(seeds)
    wdeg = weighted_out_degree(edges, weight_col)  # (src, wsum)
    # normalize once: (src, dst, w_norm)
    e = edges.join(wdeg, join_type="inner", num_partitions=num_partitions, on=("src",))
    e = e.map_batches(
        lambda t: pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "w_norm": pc.divide(t.column(weight_col), t.column("wsum")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # HybridRDD split: hub srcs' edges never enter the per-iteration join
    from ...stages.partition import broadcast_lookup, hub_ids, split_by_hubs

    hubs = hub_ids(e, "src", threshold=hub_threshold)
    if len(hubs):
        e_low, e_hub = split_by_hubs(e, "src", hubs)
        e_low = e_low.materialize()
        e_hub = e_hub.materialize()
        hub_arr = pa.array(hubs)
    else:
        e_low, e_hub = e, None

    def _teleport_vec(t: pa.Table) -> pa.Array:
        """Per-batch teleport weights: tshare on seeds, 0 elsewhere."""
        sd = pa.array(ray.get(seed_ref))
        return pc.multiply(
            pc.cast(pc.is_in(t["id"], value_set=sd), pa.float64()),
            pa.scalar(tshare),
        )

    if seed_ref is None:
        init = lambda t: pa.table(  # noqa: E731
            {"id": t.column("id"), "rank": np.ones(t.num_rows, dtype=np.float64)}
        )
    else:
        init = lambda t: pa.table(  # noqa: E731
            {"id": t.column("id"), "rank": _teleport_vec(t)}
        )
    ranks = vertices.map_batches(init, batch_format="pyarrow").materialize()

    # per-iteration distributed checkpoint/resume (north-rule lineage) —
    # the (id, rank) Dataset writes its blocks straight to disk, so the
    # V-beyond-dense regime resumes without the driver ever holding state
    ckpt = None
    start_iter = 0
    if checkpoint_root is not None:
        ckpt = CheckpointManager(
            checkpoint_root,
            job,
            "pr-ds",
            lineage_key(
                "pr-ds", N, e.count(), damping, iterations, weight_col,
                "uniform"
                if seed_ref is None
                else f"ppr:{len(seeds)}:{int(seeds.sum())}",
            ),
        )
        latest = ckpt.latest()
        if latest is not None:
            ranks = ckpt.load_dataset(latest).materialize()
            start_iter = latest + 1

    from ...stages.shuffle import grouped_aggregate

    def _contrib_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": t.column("dst"),
                "contrib": pc.multiply(
                    pc.multiply(t.column("rank"), t.column("w_norm")),
                    pa.scalar(damping),
                ),
            }
        )

    for it in range(start_iter, iterations):
        contrib = e_low.join(
            ranks.map_batches(
                lambda t: t.rename_columns(["src", "rank"]), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
        ).map_batches(_contrib_cols, batch_format="pyarrow")
        if e_hub is not None:
            # bounded-small hub rank map, broadcast — no shuffle of hub rows
            hub_rank: dict = {}
            hr = ranks.map_batches(
                lambda t: t.filter(pc.is_in(t["id"], value_set=hub_arr)),
                batch_format="pyarrow",
            )
            for b in hr.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
                hub_rank.update(zip(b["id"].to_pylist(), b["rank"].to_pylist()))
            hub_contrib = broadcast_lookup(e_hub, hub_rank, "src", "rank").map_batches(
                _contrib_cols, batch_format="pyarrow"
            )
            contrib = contrib.union(hub_contrib)
        incoming = grouped_aggregate(
            contrib, ["dst"], [("contrib", "sum", "incoming")], num_partitions
        ).map_batches(
            lambda t: t.rename_columns(["dst", "incoming"]), batch_format="pyarrow"
        )
        total_incoming = incoming.sum("incoming") or 0.0
        if seed_ref is None:
            uniform = (N - total_incoming) / N

            def upd(t: pa.Table, u=uniform) -> pa.Table:
                return pa.table(
                    {
                        "id": t.column("id"),
                        "rank": pc.add(
                            pc.fill_null(t.column("incoming"), 0.0), pa.scalar(u)
                        ),
                    }
                )
        else:
            lost = 1.0 - total_incoming

            def upd(t: pa.Table, lo=lost) -> pa.Table:
                # lost mass re-enters at the seeds: rank = incoming + lost·t(v)
                return pa.table(
                    {
                        "id": t.column("id"),
                        "rank": pc.add(
                            pc.fill_null(t.column("incoming"), 0.0),
                            pc.multiply(_teleport_vec(t), pa.scalar(lo)),
                        ),
                    }
                )

        ranks = (
            vertices.join(
                incoming.map_batches(
                    lambda t: t.rename_columns(["id", "incoming"]),
                    batch_format="pyarrow",
                ),
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("id",),
            )
            .map_batches(upd, batch_format="pyarrow")
            .materialize()
        )
        if ckpt is not None:
            ckpt.save_dataset(
                it, ranks, {"total_incoming": total_incoming, "uniform": uniform}
            )
    return ranks


def personalized_pagerank(
    graph,
    sources: np.ndarray,
    damping: float = 0.85,
    iterations: int = 20,
):
    """Personalized PageRank: the teleport distribution is uniform over
    ``sources`` instead of uniform over V (seed-set expansion / topic-
    sensitive PR, Haveliwala 2002 — the standard crawl-corpus relevance
    propagation).  Mass accounting mirrors pagerank(): whatever damped
    mass is lost to dangling vertices re-enters at the seeds, so Σrank = 1
    every iteration.

    Dense regime returns the rank vector aligned with ``graph.vids``; the
    DatasetGraph regime runs the same per-round algebra on the Dataset
    plane (``pagerank_dataset(teleport_sources=...)``) and returns the
    (id, rank) Dataset — nothing O(V) touches the driver."""
    if not graph.is_dense:
        return pagerank_dataset(
            graph.edges,
            damping=damping,
            iterations=iterations,
            weight_col=graph.weight_col,
            vertices=graph.vertices,
            teleport_sources=sources,
        )
    V = graph.num_vertices
    src_idx = np.searchsorted(graph.vids, np.asarray(sources, dtype=np.int64))
    ok = (src_idx < V) & (graph.vids[np.clip(src_idx, 0, V - 1)] == sources)
    src_idx = src_idx[ok]
    if len(src_idx) == 0:
        raise ValueError("personalized_pagerank: no source id found in graph")
    teleport = np.zeros(V, dtype=np.float64)
    teleport[src_idx] = 1.0 / len(src_idx)

    wdeg = ray.get(graph.wdeg_ref)
    inv_wdeg = np.zeros(V, dtype=np.float64)
    nz = wdeg > 0
    inv_wdeg[nz] = 1.0 / wdeg[nz]
    inv_ref = ray.put(inv_wdeg)

    rank = teleport.copy()
    with paused_gc():
        for _ in range(iterations):
            rank_ref = ray.put(rank)
            futures = [
                _pr_contrib.remote(s, rank_ref, inv_ref, damping, V)
                for s in graph.shard_refs
            ]
            incoming = np.zeros(V, dtype=np.float64)
            for lo, vec in ray.get(futures):
                incoming[lo : lo + len(vec)] += vec
            lost = 1.0 - float(incoming.sum())
            rank = lost * teleport + incoming
    return rank
