"""Segmentation structure operators (SURVEY §2.2 row "GrowSegmentation,
EdgesFromSegmentation, CombineSegmentations…"):

- ``edges_from_segmentation`` — EdgesFromSegmentation.scala:25: lift a
  graph's edges onto its segmentation: every original edge (a, b) becomes
  a (segment(a), segment(b)) edge; emitted aggregated with an ``n_edges``
  multiplicity (deterministic, SQL-mirrorable form of the reference's
  one-row-per-membership-pair bundle).
- ``combine_segmentations`` — CombineSegmentations.scala:32: the combined
  segmentation's segments are the non-empty intersections of the inputs;
  the segment key is the '|'-joined pair of keys.
- ``merge_vertices_full`` — MergeVertices.scala:36-75 full output:
  (id, segment, representative) — segments keyed by the attribute value,
  belongsTo as the id→segment column, representative = min member id
  (the reference picks a seeded-random member; min is the pinned
  deterministic choice, same normalization as components).
- ``segment_by_event_sequence`` — SegmentByEventSequence.scala:138
  analog: vertices (users) belong to one segment per event-type bigram
  they produced within a time window (the "continuous events" mode with
  sequenceLength=2 re-expressed over an event table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..context import default_partitions
from ..stages.shuffle import COALESCE_BATCH, distinct, grouped_aggregate, hash_partition


def edges_from_segmentation(
    edges: Dataset, belongs: Dataset, num_partitions: int | None = None
) -> Dataset:
    """edges (src, dst) × belongsTo (id, segment) → (seg_src, seg_dst,
    n_edges).  Two hash joins (src side then dst side)."""
    if num_partitions is None:
        num_partitions = default_partitions()
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    b_src = belongs.map_batches(
        lambda t: t.rename_columns(["src", "seg_src"]), **mb
    )
    b_dst = belongs.map_batches(
        lambda t: t.rename_columns(["dst", "seg_dst"]), **mb
    )
    j = edges.select_columns(["src", "dst"]).join(
        b_src, join_type="inner", num_partitions=num_partitions, on=("src",)
    )
    j = j.join(b_dst, join_type="inner", num_partitions=num_partitions, on=("dst",))
    ones = j.map_batches(
        lambda t: pa.table(
            {
                "seg_src": t["seg_src"],
                "seg_dst": t["seg_dst"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ),
        **mb,
    )
    return grouped_aggregate(
        ones, ["seg_src", "seg_dst"], [("one", "sum", "n_edges")], num_partitions
    )


def combine_segmentations(
    b1: Dataset, b2: Dataset, sep: str = "|", num_partitions: int | None = None
) -> Dataset:
    """Two belongsTo tables (id, segment) → (id, segment) of the
    intersection segmentation (segment = seg1 | seg2)."""
    if num_partitions is None:
        num_partitions = default_partitions()
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    left = b1.map_batches(lambda t: t.rename_columns(["id", "_s1"]), **mb)
    right = b2.map_batches(lambda t: t.rename_columns(["id", "_s2"]), **mb)
    j = left.join(right, join_type="inner", num_partitions=num_partitions, on=("id",))
    return j.map_batches(
        lambda t: pa.table(
            {
                "id": t["id"],
                "segment": pc.binary_join_element_wise(
                    pc.cast(t["_s1"], pa.string()), pc.cast(t["_s2"], pa.string()), sep
                ),
            }
        ),
        **mb,
    )


def merge_vertices_full(
    ds: Dataset, key_col: str, id_col: str, num_partitions: int | None = None
) -> Dataset:
    """MergeVertices full output: (id, segment, representative).  One
    min-aggregate per segment + a join back onto the membership table."""
    if num_partitions is None:
        num_partitions = default_partitions()
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    members = ds.select_columns([id_col, key_col]).map_batches(
        lambda t: t.rename_columns(["id", "segment"]), **mb
    )
    reps = grouped_aggregate(
        members, ["segment"], [("id", "min", "representative")], num_partitions
    )
    j = members.join(reps, join_type="inner", num_partitions=num_partitions, on=("segment",))
    return j.select_columns(["id", "segment", "representative"])


def segment_by_event_sequence(
    events: Dataset,
    window_minutes: int = 60,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    num_partitions: int | None = None,
) -> Dataset:
    """(user_id, segment) — one row per distinct event-type bigram the user
    produced with gap ≤ window (segment = "t1>t2").  One hash shuffle by
    user, then per-block vectorized sequence scan (users are
    block-complete after the shuffle)."""
    part = hash_partition(
        events.select_columns([user_col, ts_col, type_col, order_col]),
        [user_col],
        num_partitions,
    )
    win_us = np.int64(window_minutes * 60 * 1_000_000)

    def bigrams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "segment": pa.array([], pa.string()),
                }
            )
        u = t.column(user_col).to_numpy()
        ts = t.column(ts_col).to_numpy().astype("datetime64[us]").view(np.int64)
        ty = np.asarray(t.column(type_col).to_pylist(), dtype=object)
        oc = t.column(order_col).to_numpy()
        order = np.lexsort((oc, ts, u))
        u, ts, ty = u[order], ts[order], ty[order]
        same = u[1:] == u[:-1]
        ok = same & ((ts[1:] - ts[:-1]) <= win_us)
        t1 = ty[:-1][ok]
        t2 = ty[1:][ok]
        segs = np.array([f"{a}>{b}" for a, b in zip(t1, t2)], dtype=object)
        return pa.table(
            {
                user_col: u[:-1][ok],
                "segment": pa.array(segs, pa.string()),
            }
        )

    raw = part.map_batches(
        bigrams, batch_format="pyarrow", zero_copy_batch=True, batch_size=COALESCE_BATCH
    )
    return distinct(raw, [user_col, "segment"], num_partitions)


def set_overlap(
    belongs: Dataset,
    min_overlap: int = 2,
    seg_col: str = "segment",
    member_col: str = "member",
    num_partitions: int | None = None,
    max_df: int | None = None,
) -> Dataset:
    """SetOverlap.scala:25 — edges between segments sharing ≥ min_overlap
    members, with the overlap size.  Pinned form: (src < dst, overlap).

    Inverted index by member → per-member segment-pair expansion (the
    reference's prefix-tree trick bounds the same blowup; we bound it with
    a member-frequency cap like jaccard_pairs: a member on > max_df
    segments generates no pairs, and overlap counts stay exact via the
    join-back recount).
    """
    import os

    from .dedup import _typed_guard

    if num_partitions is None:
        num_partitions = default_partitions()
    if max_df is None:
        max_df = int(os.environ.get("LKR_SETOVERLAP_MAX_DF", 1000))
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    m = belongs.select_columns([seg_col, member_col]).map_batches(
        lambda t: t.rename_columns(["seg", "mem"]), **mb
    )
    m = distinct(m, ["seg", "mem"], num_partitions).materialize()

    from .dedup import VERIFY_BCAST_POSTINGS

    if m.count() <= VERIFY_BCAST_POSTINGS:
        # small-membership fast path: candidate pairs + exact recount on
        # the driver (the join plan below costs ~7 shuffle operators of
        # fixed overhead that dwarf this size)
        import ray

        tables = ray.get(m.to_arrow_refs())
        seg = np.concatenate([t.column("seg").to_numpy() for t in tables if t.num_rows])
        mem = np.concatenate([t.column("mem").to_numpy() for t in tables if t.num_rows])
        order = np.lexsort((seg, mem))
        mem_s, seg_s = mem[order], seg[order]
        bound = np.empty(len(mem_s), dtype=bool)
        if len(mem_s) == 0:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                        "overlap": pa.array([], pa.int64()),
                    }
                )
            )
        bound[0] = True
        bound[1:] = mem_s[1:] != mem_s[:-1]
        starts = np.flatnonzero(bound)
        sizes = np.diff(np.append(starts, len(mem_s)))
        src_out, dst_out = [], []
        for size in np.unique(sizes):
            if size < 2 or size > max_df:
                continue
            gs = starts[sizes == size]
            mat = seg_s[gs[:, None] + np.arange(size)[None, :]]
            iu, ju = np.triu_indices(int(size), 1)
            src_out.append(mat[:, iu].ravel())
            dst_out.append(mat[:, ju].ravel())
        if not src_out:
            import ray.data as rdm

            return rdm.from_arrow(
                pa.table(
                    {
                        "src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                        "overlap": pa.array([], pa.int64()),
                    }
                )
            )
        ps = np.concatenate(src_out)
        pd_ = np.concatenate(dst_out)
        po = np.lexsort((pd_, ps))
        ps, pd_ = ps[po], pd_[po]
        pb = np.empty(len(ps), dtype=bool)
        pb[0] = True
        pb[1:] = (ps[1:] != ps[:-1]) | (pd_[1:] != pd_[:-1])
        pstarts = np.flatnonzero(pb)
        counts = np.diff(np.append(pstarts, len(ps)))
        usrc, udst = ps[pstarts], pd_[pstarts]
        hot_members = int(np.count_nonzero(sizes > max_df))
        if hot_members:
            # exact recount for candidate pairs (capped members skipped
            # during generation still count toward overlap)
            members: dict = {}
            for sg, mm in zip(seg.tolist(), mem.tolist()):
                members.setdefault(sg, set()).add(mm)
            counts = np.fromiter(
                (
                    len(members[a] & members[b])
                    for a, b in zip(usrc.tolist(), udst.tolist())
                ),
                np.int64,
                len(usrc),
            )
        keep = counts >= min_overlap
        import ray.data as rdm

        return rdm.from_arrow(
            pa.table(
                {
                    "src": usrc[keep],
                    "dst": udst[keep],
                    "overlap": counts[keep].astype(np.int64),
                }
            )
        )

    dfs = grouped_aggregate(m, ["mem"], [("seg", "count", "df")], num_partitions)
    hot = dfs.map_batches(
        lambda t: t.filter(pc.greater(t["df"], max_df)).select(["mem"]), **mb
    )
    hot_vals = [
        x
        for b in hot.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        for x in b["mem"].to_pylist()
    ]
    gen_src = m
    if hot_vals:
        hv = pa.array(hot_vals)
        gen_src = m.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["mem"], value_set=hv))), **mb
        )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        mem = t.column("mem").to_numpy(zero_copy_only=False)
        seg = t.column("seg").to_numpy(zero_copy_only=False)
        order = np.lexsort((seg, mem))
        mem, seg = mem[order], seg[order]
        bound = np.empty(len(mem), dtype=bool)
        bound[0] = True
        bound[1:] = mem[1:] != mem[:-1]
        starts = np.flatnonzero(bound)
        sizes = np.diff(np.append(starts, len(mem)))
        src_out, dst_out = [], []
        for size in np.unique(sizes):
            if size < 2:
                continue
            gs = starts[sizes == size]
            mat = seg[gs[:, None] + np.arange(size)[None, :]]
            iu, ju = np.triu_indices(int(size), 1)
            src_out.append(mat[:, iu].ravel())
            dst_out.append(mat[:, ju].ravel())
        if not src_out:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        return pa.table(
            {"src": np.concatenate(src_out), "dst": np.concatenate(dst_out)}
        )

    cand = hash_partition(gen_src, ["mem"], num_partitions).map_batches(
        pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=COALESCE_BATCH
    )
    cand = distinct(cand, ["src", "dst"], num_partitions)

    # exact overlap recount for candidates: cand ⋈ members(src) ⋈ members(dst, mem)
    m_src = m.map_batches(lambda t: t.rename_columns(["src", "mem"]), **mb)
    m_dst = m.map_batches(lambda t: t.rename_columns(["dst", "mem"]), **mb)
    guard = _typed_guard(
        [("src", pa.int64()), ("dst", pa.int64()), ("mem", pa.int64())]
    )
    p1 = cand.join(m_src, join_type="inner", num_partitions=num_partitions, on=("src",))
    p1 = p1.map_batches(guard, **mb)
    shared = p1.join(
        m_dst, join_type="inner", num_partitions=num_partitions, on=("dst", "mem")
    ).map_batches(guard, **mb)
    counts = grouped_aggregate(
        shared.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            **mb,
        ),
        ["src", "dst"],
        [("one", "sum", "overlap")],
        num_partitions,
    )
    return counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["overlap"], min_overlap)), **mb
    )


def infocom_min_overlap(adjacency_threshold: float):
    """InfocomOverlapForCC's size-dependent overlap requirement
    (SetOverlapForCC.scala:146-154): two cliques of sizes a, b are
    adjacent iff |A ∩ B| ≥ ⌈thr·(a+b)(a²+b²)/(4ab)⌉."""
    import math

    def fn(a: int, b: int) -> int:
        return int(
            math.ceil(adjacency_threshold * (a + b) * (a * a + b * b) / (4 * a * b))
        )

    return fn


def set_overlap_for_cc(
    belongs: Dataset,
    min_overlap=2,
    seg_col: str = "segment",
    member_col: str = "member",
    num_partitions: int | None = None,
) -> Dataset:
    """SetOverlapForCC.scala:28-137 (UniformOverlapForCC variant,
    SetOverlapForCC.scala:141-145; pass ``min_overlap=callable(a, b)``
    such as :func:`infocom_min_overlap` for the InfocomOverlapForCC
    variant): edges between segments with
    |A ∩ B| ≥ min_overlap, emitting only a CC-PRESERVING SUBSET of the
    justified edges — connected components over the output equal CC over
    the full set_overlap graph, at much less edge output (the guarantee
    the reference's infocom community search relies on).

    Distributed shape mirrors the reference's two groupBys: members per
    segment (one key shuffle), segment lists per member carrying the full
    member arrays (the reference's byMember flatMap — payload is
    Σ|seg|² like the original), then a per-member kernel.  Per member v,
    a pair is emitted only when min(A∩B) == v (each justified pair
    charges exactly one member — the cross-member dedup of
    SetOverlapForCC.scala:117-121) and a BFS over the member's segment
    list skips edges inside an already-connected group
    (SetOverlapForCC.scala:96-133).  Output is symmetric (both
    directions), matching the reference's addEdges."""
    if num_partitions is None:
        num_partitions = default_partitions()
    overlap_fn = min_overlap if callable(min_overlap) else None
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    m = belongs.select_columns([seg_col, member_col]).map_batches(
        lambda t: t.rename_columns(["seg", "mem"]), **mb
    )
    m = distinct(m, ["seg", "mem"], num_partitions)

    # (seg, sorted member list) — seg block-complete after the shuffle
    def seg_lists(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "seg": pa.array([], pa.int64()),
                    "members": pa.array([], pa.list_(pa.int64())),
                }
            )
        seg = t.column("seg").to_numpy(zero_copy_only=False)
        mem = t.column("mem").to_numpy(zero_copy_only=False)
        order = np.lexsort((mem, seg))
        seg, mem = seg[order], mem[order]
        bound = np.empty(len(seg), dtype=bool)
        bound[0] = True
        bound[1:] = seg[1:] != seg[:-1]
        starts = np.flatnonzero(bound)
        offsets = np.append(starts, len(seg)).astype(np.int32)
        return pa.table(
            {
                "seg": seg[starts],
                "members": pa.ListArray.from_arrays(pa.array(offsets), pa.array(mem)),
            }
        )

    segs = hash_partition(m, ["seg"], num_partitions).map_batches(
        seg_lists, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=COALESCE_BATCH,
    )

    # byMember: one (mem, seg, members) row per member of each segment
    def by_member(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "mem": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.int64()),
                    "members": pa.array([], pa.list_(pa.int64())),
                }
            )
        lst = t.column("members").combine_chunks()
        counts = np.diff(lst.offsets.to_numpy())
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        return pa.table(
            {
                "mem": lst.values,
                "seg": t.column("seg").take(pa.array(idx)),
                "members": lst.take(pa.array(idx)),
            }
        )

    bym = segs.map_batches(
        by_member, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=COALESCE_BATCH,
    )

    def member_kernel(t: pa.Table) -> pa.Table:
        out_src: list[int] = []
        out_dst: list[int] = []
        if t.num_rows:
            mem = t.column("mem").to_numpy(zero_copy_only=False)
            seg = t.column("seg").to_numpy(zero_copy_only=False)
            members = t.column("members").to_pylist()
            order = np.argsort(mem, kind="stable")
            starts = np.flatnonzero(
                np.concatenate(([True], mem[order][1:] != mem[order][:-1]))
            )
            bounds = np.append(starts, len(order))
            for gi in range(len(starts)):
                rows = order[bounds[gi] : bounds[gi + 1]]
                if len(rows) < 2:
                    continue
                vid = int(mem[rows[0]])
                sets = [(int(seg[r]), np.asarray(members[r], np.int64)) for r in rows]
                # reference edgesFor: BFS over the member's segments,
                # emitting a pair only at its minimal common element
                idxa = list(range(len(sets)))
                while idxa:
                    todo = [idxa.pop(0)]
                    while todo:
                        current = todo.pop(0)
                        rest = []
                        for other in idxa:
                            a = sets[current][1]
                            b = sets[other][1]
                            inter = np.intersect1d(a, b, assume_unique=True)
                            need = (
                                overlap_fn(len(a), len(b))
                                if overlap_fn is not None
                                else min_overlap
                            )
                            if len(inter) >= need:
                                todo.append(other)
                                if int(inter[0]) >= vid:
                                    out_src += [sets[current][0], sets[other][0]]
                                    out_dst += [sets[other][0], sets[current][0]]
                            else:
                                rest.append(other)
                        idxa = rest
        return pa.table(
            {
                "src": pa.array(out_src, pa.int64()),
                "dst": pa.array(out_dst, pa.int64()),
            }
        )

    edges = hash_partition(bym, ["mem"], num_partitions).map_batches(
        member_kernel, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=COALESCE_BATCH,
    )
    return distinct(edges, ["src", "dst"], num_partitions)


def check_cliques(
    belongs: Dataset,
    edges: Dataset,
    seg_col: str = "segment",
    member_col: str = "member",
    num_partitions: int | None = None,
) -> Dataset:
    """CheckClique.scala:28 (needsBothDirections=False pinned): a segment
    is a clique iff every unordered member pair is connected in either
    direction.  (segment, is_clique)."""
    from ..stages.edges import canonical_edges
    from .dedup import _typed_guard

    if num_partitions is None:
        num_partitions = default_partitions()
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    m = belongs.select_columns([seg_col, member_col]).map_batches(
        lambda t: t.rename_columns(["seg", "mem"]), **mb
    )
    m = distinct(m, ["seg", "mem"], num_partitions).materialize()
    sizes = grouped_aggregate(m, ["seg"], [("mem", "count", "n")], num_partitions)

    # member pairs per segment (canonical min<max)
    def seg_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "seg": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                }
            )
        seg = t.column("seg").to_numpy()
        mem = t.column("mem").to_numpy()
        order = np.lexsort((mem, seg))
        seg, mem = seg[order], mem[order]
        bound = np.empty(len(seg), dtype=bool)
        bound[0] = True
        bound[1:] = seg[1:] != seg[:-1]
        starts = np.flatnonzero(bound)
        szs = np.diff(np.append(starts, len(seg)))
        so, xo, yo = [], [], []
        for size in np.unique(szs):
            if size < 2:
                continue
            gs = starts[szs == size]
            mat = mem[gs[:, None] + np.arange(size)[None, :]]
            iu, ju = np.triu_indices(int(size), 1)
            so.append(np.repeat(seg[gs], len(iu)))
            xo.append(mat[:, iu].ravel())
            yo.append(mat[:, ju].ravel())
        if not so:
            return pa.table(
                {
                    "seg": pa.array([], pa.int64()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "seg": np.concatenate(so),
                "src": np.concatenate(xo),
                "dst": np.concatenate(yo),
            }
        )

    pairs = hash_partition(m, ["seg"], num_partitions).map_batches(
        seg_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=COALESCE_BATCH
    )
    canon = canonical_edges(edges).map_batches(
        lambda t: t.append_column("_conn", pa.array(np.ones(t.num_rows, np.int8))), **mb
    )
    j = pairs.join(
        canon, join_type="left_outer", num_partitions=num_partitions, on=("src", "dst")
    ).map_batches(
        _typed_guard(
            [
                ("seg", pa.int64()),
                ("src", pa.int64()),
                ("dst", pa.int64()),
                ("_conn", pa.int8()),
            ]
        ),
        **mb,
    )
    conn = grouped_aggregate(
        j.map_batches(
            lambda t: pa.table(
                {
                    "seg": t["seg"],
                    "c": pc.cast(pc.fill_null(t["_conn"], 0), pa.int64()),
                }
            ),
            **mb,
        ),
        ["seg"],
        [("c", "sum", "connected")],
        num_partitions,
    )
    out = sizes.join(
        conn, join_type="left_outer", num_partitions=num_partitions, on=("seg",)
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "segment": pa.array([], pa.int64()),
                    "is_clique": pa.array([], pa.bool_()),
                }
            )
        n = t.column("n").to_numpy().astype(np.int64)
        c = pc.fill_null(t.column("connected"), 0).to_numpy(zero_copy_only=False)
        return pa.table(
            {"segment": t["seg"], "is_clique": pa.array(c == n * (n - 1) // 2)}
        )

    return out.map_batches(finalize, **mb)


def segment_quality(
    edges: Dataset,
    belongs: Dataset,
    num_partitions: int | None = None,
) -> Dataset:
    """Per-segment quality metrics over an undirected simple edge set —
    the SegmentationAttributeOperations.scala:66-76 family
    (networkit_compute_segment_attribute.go executes it in the reference):

    (segment, size, internal_edges, cut_edges, coverage, density,
     expansion, conductance, hub_dominance)

    - coverage    = internal / m          (this segment's share; summing the
                                           column gives global coverage)
    - density     = internal / C(size,2)  (0 when size < 2)
    - expansion   = cut / size
    - conductance = cut / min(vol, 2m−vol), vol = 2·internal + cut
                    (0 when the min is 0)
    - hub_dominance = max internal degree / (size − 1)

    Scale shape: two hash joins label the edge endpoints (the belongsTo
    side is vertex-sized — never broadcast), then everything is grouped
    aggregates keyed by segment; per-segment rows join back by key.  No
    driver-side collection, no per-row Python.

    ``edges``: (src, dst) canonical undirected simple; ``belongs``:
    (id, segment)."""
    if num_partitions is None:
        num_partitions = default_partitions()
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)

    m = edges.count()
    b_src = belongs.map_batches(lambda t: t.rename_columns(["src", "b_src"]), **mb)
    b_dst = belongs.map_batches(lambda t: t.rename_columns(["dst", "b_dst"]), **mb)
    le = (
        edges.select_columns(["src", "dst"])
        .join(b_src, join_type="inner", num_partitions=num_partitions, on=("src",))
        .join(b_dst, join_type="inner", num_partitions=num_partitions, on=("dst",))
    ).materialize()

    seg_ty = le.schema().base_schema.field("b_src").type

    def _counted(tbl: Dataset, cols_fn, name: str) -> Dataset:
        ones = tbl.map_batches(cols_fn, **mb)
        return grouped_aggregate(
            ones, ["segment"], [("one", "sum", name)], num_partitions
        )

    def internal_cols(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["b_src"], t["b_dst"]))
        return pa.table(
            {
                "segment": s["b_src"],
                "one": pa.array(np.ones(s.num_rows, np.int64)),
            }
        )

    internal = _counted(le, internal_cols, "internal_edges")

    def cut_cols(t: pa.Table) -> pa.Table:
        d = t.filter(pc.not_equal(t["b_src"], t["b_dst"]))
        seg = pa.chunked_array([*d["b_src"].chunks, *d["b_dst"].chunks])
        return pa.table(
            {"segment": seg, "one": pa.array(np.ones(2 * d.num_rows, np.int64))}
        )

    cut = _counted(le, cut_cols, "cut_edges")

    # per-vertex internal degree -> max per segment (hub dominance numerator)
    def int_deg_cols(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["b_src"], t["b_dst"]))
        return pa.table(
            {
                "segment": pa.chunked_array([*s["b_src"].chunks, *s["b_dst"].chunks]),
                "v": pa.chunked_array([*s["src"].chunks, *s["dst"].chunks]),
                "one": pa.array(np.ones(2 * s.num_rows, np.int64)),
            }
        )

    vdeg = grouped_aggregate(
        le.map_batches(int_deg_cols, **mb),
        ["segment", "v"],
        [("one", "sum", "d")],
        num_partitions,
    )
    maxdeg = grouped_aggregate(
        vdeg.select_columns(["segment", "d"]),
        ["segment"],
        [("d", "max", "max_int_deg")],
        num_partitions,
    )

    sizes = grouped_aggregate(
        belongs.map_batches(
            lambda t: pa.table(
                {
                    "segment": t.column(t.schema.names[1]),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            **mb,
        ),
        ["segment"],
        [("one", "sum", "size")],
        num_partitions,
    )

    # Chained left joins: Ray's JoinOperator emits SCHEMA-LESS empty blocks
    # for empty hash partitions, and a schema-less block on the left of the
    # next join raises ArrowInvalid — restore the typed empty between hops
    # (the dedup.py _typed_guard pattern).
    def _guard(expected: list[tuple[str, pa.DataType]]):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({n: pa.array([], type=ty) for n, ty in expected})
            return t

        return fn

    base = [("segment", seg_ty), ("size", pa.int64())]
    steps = [
        (internal, ("internal_edges", pa.int64())),
        (cut, ("cut_edges", pa.int64())),
        (maxdeg, ("max_int_deg", pa.int64())),
    ]
    out = sizes
    acc = list(base)
    for other, col in steps:
        out = out.join(
            other, join_type="left_outer", num_partitions=num_partitions,
            on=("segment",),
        )
        acc.append(col)
        out = out.map_batches(_guard(list(acc)), **mb)

    from ..util import round_away

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = np.empty(0)
            return pa.table(
                {
                    "segment": pa.array([], seg_ty),
                    "size": pa.array([], pa.int64()),
                    "internal_edges": pa.array([], pa.int64()),
                    "cut_edges": pa.array([], pa.int64()),
                    "coverage": z,
                    "density": z,
                    "expansion": z,
                    "conductance": z,
                    "hub_dominance": z,
                }
            )
        size = t.column("size").to_numpy(zero_copy_only=False).astype(np.float64)
        internal_ = (
            pc.fill_null(t.column("internal_edges"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        cut_ = (
            pc.fill_null(t.column("cut_edges"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        mx = (
            pc.fill_null(t.column("max_int_deg"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        vol = 2.0 * internal_ + cut_
        pairs = size * (size - 1.0) / 2.0
        density = np.divide(internal_, pairs, out=np.zeros_like(internal_), where=pairs > 0)
        expansion = np.divide(cut_, size, out=np.zeros_like(cut_), where=size > 0)
        cden = np.minimum(vol, 2.0 * m - vol)
        conductance = np.divide(cut_, cden, out=np.zeros_like(cut_), where=cden > 0)
        hub = np.divide(mx, size - 1.0, out=np.zeros_like(mx), where=size > 1)
        return pa.table(
            {
                "segment": t["segment"],
                "size": pc.cast(t["size"], pa.int64()),
                "internal_edges": pa.array(internal_.astype(np.int64)),
                "cut_edges": pa.array(cut_.astype(np.int64)),
                "coverage": round_away(internal_ / m if m else internal_, 6),
                "density": round_away(density, 6),
                "expansion": round_away(expansion, 6),
                "conductance": round_away(conductance, 6),
                "hub_dominance": round_away(hub, 6),
            }
        )

    return out.map_batches(finalize, **mb)


def infocom_communities(
    edges: Dataset,
    min_clique_size: int = 3,
    adjacency_threshold: float = 0.6,
) -> Dataset:
    """Find infocom communities (BuildSegmentationOperations.scala:136-199):
    maximal cliques → clique-overlap edges with the Infocom size-dependent
    threshold (InfocomOverlapForCC, SetOverlapForCC.scala:146-154) →
    connected components over the clique graph → per-vertex community via
    the concatenated belongsTo.  Overlapping-community model: a vertex in
    cliques of different components belongs to several communities.

    Output: (member, community) distinct rows; community = min clique id
    of the clique-graph component."""
    import ray.data as rd

    from ..stages.partition import broadcast_lookup
    from .graph import Graph, connected_components
    from .graph.cliques import find_max_cliques

    belongs = find_max_cliques(edges, min_clique_size).materialize()
    cedges = set_overlap_for_cc(
        belongs,
        min_overlap=infocom_min_overlap(adjacency_threshold),
        seg_col="clique_id",
        member_col="member",
    ).map_batches(
        # re-type: tiny clique graphs leave empty schema-less blocks behind
        # the overlap kernel, which Graph.from_edges' block scan rejects
        lambda t: t.select(["src", "dst"]),
        batch_format="pyarrow",
        batch_size=COALESCE_BATCH,
    ).materialize()
    clique_ids = np.unique(
        np.concatenate(
            [
                b["clique_id"].to_numpy()
                for b in belongs.iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
            or [np.empty(0, np.int64)]
        )
    )
    if len(clique_ids) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "member": pa.array([], pa.int64()),
                    "community": pa.array([], pa.int64()),
                }
            )
        )
    if cedges.count() == 0:
        # no qualifying clique overlap: every clique is its own community
        comm = {int(c): int(c) for c in clique_ids}
    else:
        g = Graph.from_edges(cedges, extra_vertices=clique_ids)
        labels = connected_components(g)
        comm = dict(zip(g.vids.tolist(), np.asarray(labels, np.int64).tolist()))
    out = broadcast_lookup(belongs, comm, "clique_id", "community")
    return distinct(
        out.select_columns(["member", "community"]), ["member", "community"]
    )


def segment_stability(
    edges: Dataset, belongs: Dataset, num_partitions: int | None = None
) -> Dataset:
    """Per-segment stability (SegmentationAttributeOperations.scala:62-65;
    NetworKit StablePartitionNodes): a member is *stable* iff it has at
    least as many neighbors inside its own segment as inside any other
    single segment (members with no neighbors are stable); stability =
    stable members / segment size.

    Output: (segment, size, stable_nodes, stability).

    Scale shape: endpoint labeling via two hash joins (belongsTo never
    broadcast), per-(vertex, neighbor-segment) counts, one grouped
    max/compare per vertex, one grouped count per segment."""
    if num_partitions is None:
        num_partitions = default_partitions()
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    b_src = belongs.map_batches(lambda t: t.rename_columns(["src", "b_src"]), **mb)
    b_dst = belongs.map_batches(lambda t: t.rename_columns(["dst", "b_dst"]), **mb)
    le = (
        edges.select_columns(["src", "dst"])
        .join(b_src, join_type="inner", num_partitions=num_partitions, on=("src",))
        .join(b_dst, join_type="inner", num_partitions=num_partitions, on=("dst",))
    )

    # symmetric neighbor view: (u, own segment, neighbor segment)
    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.chunked_array([*t["src"].chunks, *t["dst"].chunks]),
                "own": pa.chunked_array([*t["b_src"].chunks, *t["b_dst"].chunks]),
                "nseg": pa.chunked_array([*t["b_dst"].chunks, *t["b_src"].chunks]),
                "one": pa.array(np.ones(2 * t.num_rows, np.int64)),
            }
        )

    per = grouped_aggregate(
        le.map_batches(both_dirs, **mb),
        ["u", "own", "nseg"],
        [("one", "sum", "c")],
        num_partitions,
    )

    def split(t: pa.Table) -> pa.Table:
        same = pc.equal(t["own"], t["nseg"])
        c = t.column("c").to_numpy(zero_copy_only=False)
        s = same.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": t["u"],
                "segment": t["own"],
                "own_c": pa.array(np.where(s, c, 0), pa.int64()),
                "other_c": pa.array(np.where(s, 0, c), pa.int64()),
            }
        )

    pv = grouped_aggregate(
        per.map_batches(split, **mb),
        ["u", "segment"],
        [("own_c", "max", "own"), ("other_c", "max", "othermax")],
        num_partitions,
    )

    def unstable_cols(t: pa.Table) -> pa.Table:
        own = t.column("own").to_numpy(zero_copy_only=False)
        om = t.column("othermax").to_numpy(zero_copy_only=False)
        bad = own < om
        return pa.table(
            {
                "segment": t.column("segment").filter(pa.array(bad)),
                "one": pa.array(np.ones(int(bad.sum()), np.int64)),
            }
        )

    unstable = grouped_aggregate(
        pv.map_batches(unstable_cols, **mb),
        ["segment"],
        [("one", "sum", "unstable")],
        num_partitions,
    )
    sizes = grouped_aggregate(
        belongs.map_batches(
            lambda t: pa.table(
                {
                    "segment": t.column(t.schema.names[1]),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            **mb,
        ),
        ["segment"],
        [("one", "sum", "size")],
        num_partitions,
    )
    bschema = belongs.schema().base_schema
    seg_ty = bschema.field(bschema.names[1]).type

    def _guard(expected):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({n: pa.array([], type=ty) for n, ty in expected})
            return t.select([n for n, _ in expected])

        return fn

    joined = sizes.join(
        unstable, join_type="left_outer", num_partitions=num_partitions,
        on=("segment",),
    ).map_batches(
        _guard(
            [("segment", seg_ty), ("size", pa.int64()), ("unstable", pa.int64())]
        ),
        **mb,
    )

    def finalize(t: pa.Table) -> pa.Table:
        from ..util import round_away

        size = t.column("size").to_numpy(zero_copy_only=False).astype(np.float64)
        uns = t.column("unstable").to_numpy(zero_copy_only=False)
        uns = np.where(np.isnan(uns.astype(np.float64)), 0, uns).astype(np.float64)
        stable = size - uns
        return pa.table(
            {
                "segment": t["segment"],
                "size": pa.array(size.astype(np.int64)),
                "stable_nodes": pa.array(stable.astype(np.int64)),
                "stability": pa.array(round_away(stable / size, 6)),
            }
        )

    return joined.map_batches(finalize, **mb)


def segment_fragmentation(
    edges: Dataset, belongs: Dataset, num_partitions: int | None = None
) -> Dataset:
    """Per-segment fragmentation (SegmentationAttributeOperations.scala:86;
    NetworKit PartitionFragmentation): 1 − (largest connected component of
    the segment's induced subgraph) / segment size.

    Output: (segment, size, largest_component, fragmentation).

    Scale shape: intra-segment edge filter (two hash joins), ONE global
    connected-components run over the union of induced subgraphs (intra
    edges never cross segments, so components stay inside segments), then
    grouped max by segment."""
    if num_partitions is None:
        num_partitions = default_partitions()
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)

    from .graph import Graph, connected_components

    b_src = belongs.map_batches(lambda t: t.rename_columns(["src", "b_src"]), **mb)
    b_dst = belongs.map_batches(lambda t: t.rename_columns(["dst", "b_dst"]), **mb)
    le = (
        edges.select_columns(["src", "dst"])
        .join(b_src, join_type="inner", num_partitions=num_partitions, on=("src",))
        .join(b_dst, join_type="inner", num_partitions=num_partitions, on=("dst",))
    )
    intra = le.map_batches(
        lambda t: t.filter(pc.equal(t["b_src"], t["b_dst"])).select(["src", "dst"]),
        **mb,
    ).materialize()
    member_ids = np.unique(
        np.concatenate(
            [
                b[belongs.schema().names[0]].to_numpy()
                for b in belongs.iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
            or [np.empty(0, np.int64)]
        )
    )
    if intra.count() == 0:
        comp_tbl = pa.table({"id": member_ids, "comp": member_ids})
    else:
        g = Graph.from_edges(intra, extra_vertices=member_ids)
        labels = connected_components(g)
        comp_tbl = pa.table({"id": g.vids, "comp": np.asarray(labels, np.int64)})
    import ray.data as rd

    comps = rd.from_arrow(comp_tbl)
    bl = belongs.map_batches(lambda t: t.rename_columns(["id", "segment"]), **mb)
    j = bl.join(comps, join_type="inner", num_partitions=num_partitions, on=("id",))
    percomp = grouped_aggregate(
        j.map_batches(
            lambda t: pa.table(
                {
                    "segment": t["segment"],
                    "comp": t["comp"],
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            **mb,
        ),
        ["segment", "comp"],
        [("one", "sum", "n")],
        num_partitions,
    )
    largest = grouped_aggregate(
        percomp.select_columns(["segment", "n"]),
        ["segment"],
        [("n", "max", "largest_component")],
        num_partitions,
    )
    sizes = grouped_aggregate(
        bl.map_batches(
            lambda t: pa.table(
                {
                    "segment": t["segment"],
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            **mb,
        ),
        ["segment"],
        [("one", "sum", "size")],
        num_partitions,
    )
    joined = sizes.join(
        largest, join_type="inner", num_partitions=num_partitions, on=("segment",)
    )

    def finalize(t: pa.Table) -> pa.Table:
        from ..util import round_away

        size = t.column("size").to_numpy(zero_copy_only=False).astype(np.float64)
        big = (
            t.column("largest_component")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        return pa.table(
            {
                "segment": t["segment"],
                "size": pa.array(size.astype(np.int64)),
                "largest_component": pa.array(big.astype(np.int64)),
                "fragmentation": pa.array(round_away(1.0 - big / size, 6)),
            }
        )

    return joined.map_batches(finalize, **mb)


def segmentation_scalars(
    edges: Dataset, belongs: Dataset, num_partitions: int | None = None
) -> Dataset:
    """Whole-segmentation scalars (SegmentationAttributeOperations.scala:
    92-103; NetworKit Coverage / EdgeCut): coverage = intra-segment edges
    / all edges, edge_cut = number of inter-segment edges (unweighted,
    each undirected edge once).  One row."""
    if num_partitions is None:
        num_partitions = default_partitions()
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    b_src = belongs.map_batches(lambda t: t.rename_columns(["src", "b_src"]), **mb)
    b_dst = belongs.map_batches(lambda t: t.rename_columns(["dst", "b_dst"]), **mb)
    le = (
        edges.select_columns(["src", "dst"])
        .join(b_src, join_type="inner", num_partitions=num_partitions, on=("src",))
        .join(b_dst, join_type="inner", num_partitions=num_partitions, on=("dst",))
    )

    def flags(t: pa.Table) -> pa.Table:
        same = pc.equal(t["b_src"], t["b_dst"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "intra": pa.array(same.astype(np.int64)),
                "inter": pa.array((~same).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = le.map_batches(flags, **mb).aggregate(Sum("intra"), Sum("inter"))
    import ray.data as rd

    from ..util import round_away

    m = edges.count()
    intra = int(agg["sum(intra)"] or 0)
    inter = int(agg["sum(inter)"] or 0)
    return rd.from_arrow(
        pa.table(
            {
                "coverage": round_away(np.array([intra / m if m else 0.0]), 6),
                "edge_cut": pa.array([inter], pa.int64()),
            }
        )
    )
