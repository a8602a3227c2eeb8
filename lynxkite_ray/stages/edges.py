"""Edge-table construction and structure transforms over (src, dst[, weight])
Datasets — StripDuplicateEdgesFromBundle / AddReversedEdges / ReverseEdges /
OutDegree analogs (see SURVEY §2.2), expressed Ray-Data-first.

All shuffles here key on ``(src, dst)`` (dedup) or ``src``/``dst`` (degree),
with a vectorized per-block pre-combine inside ``map_batches`` before the
hash shuffle so hubs don't blow up the exchange (HybridRDD.scala:56-58 notes
the same reliance on map-side combining).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..context import default_partitions, num_blocks_for
from .shuffle import distinct, grouped_aggregate


def _local_dedup(batch: pa.Table) -> pa.Table:
    """Per-block (src, dst) dedup — the map-side combine before the shuffle."""
    src = batch.column("src").to_numpy()
    dst = batch.column("dst").to_numpy()
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    keep = np.empty(len(s), dtype=bool)
    keep[0:1] = True
    keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
    return pa.table({"src": s[keep], "dst": d[keep]})


# Below this many (pre-deduped) rows the pair dedup runs as a direct task
# exchange (split by pair hash → per-bucket dedup) instead of the Dataset
# hash shuffle: the shuffle operator's actor-pool spin-up costs seconds of
# fixed overhead that dwarf small exchanges, while the task exchange's
# O(blocks × buckets) object count caps its own scale — the same
# small/large two-path split as HybridRDD.
TASK_DEDUP_MAX_ROWS = int(__import__("os").environ.get("LKR_TASK_DEDUP_ROWS", 50_000_000))


@ray.remote
def _pair_split(t: pa.Table, nb: int):
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    h = (
        src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ^ dst.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    ) % np.uint64(nb)
    idx = h.astype(np.int64)
    order = np.argsort(idx, kind="stable")
    src, dst, idx = src[order], dst[order], idx[order]
    counts = np.bincount(idx, minlength=nb)
    offs = np.concatenate(([0], np.cumsum(counts)))
    out = tuple(
        pa.table({"src": src[offs[b] : offs[b + 1]], "dst": dst[offs[b] : offs[b + 1]]})
        for b in range(nb)
    )
    return out if nb > 1 else out[0]


@ray.remote
def _pair_dedup_bucket(*parts: pa.Table):
    tables = [p for p in parts if p.num_rows]
    if not tables:
        e = np.empty(0, np.int64)
        return pa.table({"src": e, "dst": e})
    src = np.concatenate([t.column("src").to_numpy() for t in tables])
    dst = np.concatenate([t.column("dst").to_numpy() for t in tables])
    return _local_dedup(pa.table({"src": src, "dst": dst}))


def _pair_exchange_dedup(mat: Dataset) -> Dataset:
    """Exact (src, dst) dedup of a materialized pre-deduped pair Dataset
    via one raw-task exchange."""
    import ray.data as rd

    block_refs = mat.to_arrow_refs()
    if not block_refs:
        return mat
    nb = min(64, max(1, num_blocks_for(mat.count())))
    if nb == 1:
        return rd.from_arrow_refs([_pair_dedup_bucket.remote(*block_refs)])
    splits = [_pair_split.options(num_returns=nb).remote(r, nb) for r in block_refs]
    buckets = [
        _pair_dedup_bucket.remote(*[s[b] for s in splits]) for b in range(nb)
    ]
    return rd.from_arrow_refs(buckets)


def links_to_edges(links: Dataset) -> Dataset:
    """links (src, dst, …) → deduplicated (src, dst) edge table.

    Semantics: StripDuplicateEdgesFromBundle.scala:23-38 (reduceByKey keep
    one representative; here the pair IS the value so dedup is exact).
    Sentinel rows (dst = -1, pages without out-links) are dropped — those
    pages remain vertices via vertex-set construction.
    """
    e = links.select_columns(["src", "dst"])
    e = e.map_batches(
        lambda t: _local_dedup(t.filter(pc.greater_equal(t["dst"], 0))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    if e.count() <= TASK_DEDUP_MAX_ROWS:
        return _pair_exchange_dedup(e)
    # global dedup: hash shuffle on the pair, per-block keep-one
    return distinct(e, ["src", "dst"])


def edge_multiplicity(links: Dataset) -> Dataset:
    """(src, dst, multiplicity) — parallel-edge counts before dedup."""
    e = links.select_columns(["src", "dst"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["dst"], 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_aggregate(
        e.map_batches(
            lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
        [("one", "sum", "multiplicity")],
    )


def reverse_edges(edges: Dataset) -> Dataset:
    """ReverseEdges.scala:30 — swap src/dst (zero-copy column rename)."""

    def swap(t: pa.Table) -> pa.Table:
        cols = {"src": t.column("dst"), "dst": t.column("src")}
        for name in t.schema.names:
            if name not in ("src", "dst"):
                cols[name] = t.column(name)
        return pa.table(cols)

    return edges.map_batches(swap, batch_format="pyarrow", zero_copy_batch=True)


def add_reversed_edges(edges: Dataset) -> Dataset:
    """AddReversedEdges.scala:42-69 — for each A→B also emit B→A (then the
    caller dedups if the symmetrized bundle must be simple)."""

    def both(t: pa.Table) -> pa.Table:
        src = t.column("src")
        dst = t.column("dst")
        return pa.table(
            {
                "src": pa.chunked_array([*src.chunks, *dst.chunks]),
                "dst": pa.chunked_array([*dst.chunks, *src.chunks]),
            }
        )

    return edges.select_columns(["src", "dst"]).map_batches(
        both, batch_format="pyarrow", zero_copy_batch=True
    )


def symmetrize(edges: Dataset) -> Dataset:
    """Undirected simple view: A→B ∪ B→A, deduplicated, self-loops dropped
    (the form CC / LPA / triangles consume)."""
    e = add_reversed_edges(edges).map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return links_to_edges(e)


def canonical_edges(edges: Dataset) -> Dataset:
    """(min, max) canonical undirected simple edges, deduplicated — the
    triangle-counting input form (EnumerateTriangles.scala:39-47: drop loops,
    canonicalize, dedup parallel edges)."""

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return _local_dedup(pa.table({"src": lo, "dst": hi}))

    e = edges.select_columns(["src", "dst"]).map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if e.count() <= TASK_DEDUP_MAX_ROWS:
        return _pair_exchange_dedup(e)
    return distinct(e, ["src", "dst"])


def vertices_from_edges(edges: Dataset) -> Dataset:
    """Vertex set = distinct ids appearing as src or dst (VerticesToEdges
    semantics: every name on either side becomes a vertex,
    VerticesToEdges.scala:30-64)."""

    def ids(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table({"id": np.unique(np.concatenate([s, d]))})

    v = edges.select_columns(["src", "dst"]).map_batches(
        ids, batch_format="pyarrow", zero_copy_batch=True
    )
    return distinct(v, ["id"])


def out_degree(
    edges: Dataset, vertices: Dataset | None = None, num_partitions: int | None = None
) -> Dataset:
    """OutDegree.scala:25-39 — per-src edge count; vertices with no
    out-edges get degree 0 when a vertex set is supplied (left join)."""
    ones = edges.select_columns(["src"]).map_batches(
        lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    deg = grouped_aggregate(ones, ["src"], [("one", "sum", "degree")])
    if vertices is None:
        return deg.map_batches(
            lambda t: t.rename_columns(["id", "degree"]), batch_format="pyarrow"
        )
    deg = deg.map_batches(lambda t: t.rename_columns(["id", "degree"]), batch_format="pyarrow")
    if num_partitions is None:
        from ..context import default_partitions

        num_partitions = default_partitions()
    joined = vertices.join(
        deg, join_type="left_outer", num_partitions=num_partitions, on=("id",)
    )
    return joined.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("degree"),
            "degree",
            pc.fill_null(t.column("degree"), 0),
        ),
        batch_format="pyarrow",
    )


def in_degree(edges: Dataset, vertices: Dataset | None = None) -> Dataset:
    return out_degree(reverse_edges(edges), vertices)


def remove_non_symmetric(edges: Dataset, num_partitions: int | None = None) -> Dataset:
    """RemoveNonSymmetricEdges.scala:20 — keep only edges whose reverse is
    also present (distinct view). Hash semi-join on the swapped pair."""
    e = distinct(edges.select_columns(["src", "dst"]), ["src", "dst"])
    rev = reverse_edges(e).map_batches(
        lambda t: t.append_column("_r", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    j = e.join(
        rev,
        join_type="inner",
        num_partitions=num_partitions or default_partitions(),
        on=("src", "dst"),
    )
    return j.select_columns(["src", "dst"])


def make_symmetric(edges: Dataset) -> Dataset:
    """MakeEdgeBundleSymmetric.scala:15 — per unordered pair keep
    min(|A→B|, |B→A|) matched edge pairs; emitted as that many rows in
    each direction."""
    m = edge_multiplicity(edges)

    def canon_counts(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        c = t.column("multiplicity").to_numpy()
        keep = s != d
        s, d, c = s[keep], d[keep], c[keep]
        fwd = s < d
        return pa.table(
            {
                "lo": np.where(fwd, s, d),
                "hi": np.where(fwd, d, s),
                "fwd": c * fwd,
                "bwd": c * (~fwd),
            }
        )

    agg = grouped_aggregate(
        m.map_batches(canon_counts, batch_format="pyarrow"),
        ["lo", "hi"],
        [("fwd", "sum", "n_fwd"), ("bwd", "sum", "n_bwd")],
    )

    def expand(t: pa.Table) -> pa.Table:
        lo = t.column("lo").to_numpy()
        hi = t.column("hi").to_numpy()
        k = np.minimum(t.column("n_fwd").to_numpy(), t.column("n_bwd").to_numpy())
        pos = k > 0
        lo, hi, k = lo[pos], hi[pos], k[pos]
        src = np.concatenate([np.repeat(lo, k), np.repeat(hi, k)])
        dst = np.concatenate([np.repeat(hi, k), np.repeat(lo, k)])
        return pa.table({"src": src, "dst": dst})

    return agg.map_batches(expand, batch_format="pyarrow")


def induced_subgraph(edges: Dataset, vertex_ids) -> Dataset:
    """InducedEdgeBundle.scala:91-186 (induceSrc + induceDst with identity
    mappings) — keep edges whose BOTH endpoints are in the vertex set
    (broadcast membership filter)."""
    import ray

    vals = np.asarray(sorted(vertex_ids), dtype=np.int64)
    ref = ray.put(vals)

    def body(t: pa.Table) -> pa.Table:
        vs = pa.array(ray.get(ref))
        keep = pc.and_(
            pc.is_in(t["src"], value_set=vs), pc.is_in(t["dst"], value_set=vs)
        )
        return t.filter(keep)

    return edges.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def edges_from_matches(ds: Dataset, key_col: str, id_col: str) -> Dataset:
    """EdgesFromAttributeMatches.scala:17 — connect every pair of rows
    sharing the key value (emitted canonical src < dst, distinct ids).
    Key shuffle then vectorized per-group pair expansion (groups are
    block-complete after the hash partition)."""
    from .shuffle import hash_partition

    part = hash_partition(ds.select_columns([key_col, id_col]), [key_col])

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(id_col).to_numpy()
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        keep = np.empty(len(k), dtype=bool)
        keep[0] = True
        keep[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
        k, v = k[keep], v[keep]
        bound = np.empty(len(k), dtype=bool)
        bound[0] = True
        bound[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(bound)
        counts = np.diff(np.append(starts, len(k)))
        src_out, dst_out = [], []
        for size in np.unique(counts):
            if size < 2:
                continue
            gs = starts[counts == size]
            mat = v[gs[:, None] + np.arange(size)[None, :]]
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

    return part.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def weighted_out_degree(edges: Dataset, weight_col: str = "weight") -> Dataset:
    """Σ weight per src (the PageRank normalizer; weights ≤ 0 dropped first
    per PageRank.scala:44)."""
    e = edges.map_batches(
        lambda t: t.filter(pc.greater(t[weight_col], 0.0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_aggregate(e, ["src"], [(weight_col, "sum", "wsum")])


def assert_unique_keys(ds: Dataset, keys: list[str], num_partitions: int | None = None) -> Dataset:
    """RDDUtils.scala assertUniqueKeys analog: raise if any key repeats
    (the reference asserts inside sortUnique; we pay one grouped count).
    Returns the input unchanged (already-materialized pass-through)."""
    dup = grouped_aggregate(
        ds.select_columns(keys).map_batches(
            lambda t, k=tuple(keys): pa.table(
                {**{c: t[c] for c in k}, "one": pa.array(np.ones(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ),
        keys,
        [("one", "sum", "n")],
        num_partitions,
    ).map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
    )
    bad = dup.take(1)
    if bad:
        raise ValueError(
            f"assert_unique_keys: duplicate key {dict((k, bad[0][k]) for k in keys)}"
        )
    return ds


def resolve_edges_by_keys(
    named_edges: Dataset,
    vertices: Dataset,
    key_col: str,
    id_col: str,
    src_key: str = "src_name",
    dst_key: str = "dst_name",
    num_partitions: int | None = None,
) -> Dataset:
    """ImportEdgesForExistingVertices (ImportGraphFromTable.scala:46-79):
    edge endpoints arrive as attribute VALUES; resolve both ends to vertex
    ids through the (key → id) map, asserting the map's keys are unique
    (the reference's assertUniqueKeys — silent dup-key joins would
    multiply edges).  Two hash joins, same shape as the reference's two
    HybridRDD lookups."""
    if num_partitions is None:
        num_partitions = default_partitions()
    keymap = assert_unique_keys(
        vertices.select_columns([key_col, id_col]).materialize(), [key_col]
    )
    src_map = keymap.map_batches(
        lambda t: t.rename_columns([src_key, "src"]), batch_format="pyarrow"
    )
    dst_map = keymap.map_batches(
        lambda t: t.rename_columns([dst_key, "dst"]), batch_format="pyarrow"
    )
    j = named_edges.select_columns([src_key, dst_key]).join(
        src_map, join_type="inner", num_partitions=num_partitions, on=(src_key,)
    )
    j = j.join(dst_map, join_type="inner", num_partitions=num_partitions, on=(dst_key,))
    return j.select_columns(["src", "dst"])


def pulled_over_attribute(
    attr: Dataset,
    mapping: Dataset,
    attr_id: str = "id",
    map_src: str = "src",
    map_dst: str = "dst",
    num_partitions: int | None = None,
) -> Dataset:
    """PulledOverAttribute.scala:35 — pull a vertex attribute through an
    id-mapping edge bundle: every (src → dst) mapping edge gives dst a copy
    of src's attribute values.  One hash join keyed on the original id."""
    if num_partitions is None:
        num_partitions = default_partitions()
    m = mapping.select_columns([map_src, map_dst]).map_batches(
        lambda t: t.rename_columns([attr_id, "_new_id"]), batch_format="pyarrow"
    )
    j = attr.join(m, join_type="inner", num_partitions=num_partitions, on=(attr_id,))
    drop = attr_id

    def finish(t: pa.Table) -> pa.Table:
        cols = {"id": t["_new_id"]}
        for name in t.column_names:
            if name not in ("_new_id", drop):
                cols[name] = t[name]
        return pa.table(cols)

    return j.map_batches(finish, batch_format="pyarrow")


def loop_edge_bundle(vertices: Dataset, id_col: str = "id") -> Dataset:
    """LoopEdgeBundle.scala:20 — one self-loop per vertex."""
    return vertices.map_batches(
        lambda t: pa.table({"src": t[id_col], "dst": t[id_col]}),
        batch_format="pyarrow",
    )


def empty_edge_bundle() -> Dataset:
    """EmptyEdgeBundle.scala — the typed empty (src, dst) bundle."""
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    )
