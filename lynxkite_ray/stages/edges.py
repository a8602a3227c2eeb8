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

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..context import num_blocks_for
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
    )
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
    )
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
    edges: Dataset, vertices: Dataset | None = None, num_partitions: int = 16
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


def weighted_out_degree(edges: Dataset, weight_col: str = "weight") -> Dataset:
    """Σ weight per src (the PageRank normalizer; weights ≤ 0 dropped first
    per PageRank.scala:44)."""
    e = edges.map_batches(
        lambda t: t.filter(pc.greater(t[weight_col], 0.0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return grouped_aggregate(e, ["src"], [(weight_col, "sum", "wsum")])
