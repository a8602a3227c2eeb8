"""Triangle counting — edge-iterator algorithm, reference semantics
(EnumerateTriangles.scala:29-127): drop self-loops, canonicalize + dedup
parallel edges, each triangle found exactly once via an acyclic orientation.

We orient edges low-degree → high-degree endpoint (ties by id) instead of
the reference's plain id ordering (EnumerateTriangles.scala:41-47) — the
standard wedge-bounding improvement; changes only performance, never the
count (SURVEY §7.2.6).

Local path (≤ LOCAL_EDGE_THRESHOLD edges): pandas hash-join wedge counting.
Distributed path: the same two joins as Dataset.join ops —
  oriented ⋈ oriented on (b=a)  → wedges (a,b,c)
  wedges  ⋈ oriented on (a,c)   → triangles
with per-batch combine for the count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ...stages.edges import canonical_edges


def _orient(df: pd.DataFrame) -> pd.DataFrame:
    """canonical (src<dst) simple edges → degree-ordered orientation
    (a → b with (deg,id) of a < (deg,id) of b)."""
    deg = (
        pd.concat([df["src"], df["dst"]])
        .value_counts()
        .rename_axis("v")
        .reset_index(name="deg")
    )
    dmap = dict(zip(deg["v"], deg["deg"]))
    ds_ = df["src"].map(dmap).to_numpy()
    dd_ = df["dst"].map(dmap).to_numpy()
    s = df["src"].to_numpy()
    d = df["dst"].to_numpy()
    src_first = (ds_ < dd_) | ((ds_ == dd_) & (s < d))
    a = np.where(src_first, s, d)
    b = np.where(src_first, d, s)
    return pd.DataFrame({"a": a, "b": b})


def _count_local(edges_df: pd.DataFrame, per_vertex: bool):
    o = _orient(edges_df)
    wedges = o.merge(o, left_on="b", right_on="a", suffixes=("1", "2"))
    # wedge a1 → b1 (=a2) → b2 ; triangle iff (a1, b2) is an oriented edge
    wedges = wedges.rename(columns={"a1": "a", "b1": "b", "b2": "c"})[["a", "b", "c"]]
    closed = wedges.merge(o, left_on=["a", "c"], right_on=["a", "b"])
    tri = closed[["a", "b_x", "c"]].rename(columns={"b_x": "b"})
    if not per_vertex:
        return len(tri)
    counts = (
        pd.concat([tri["a"], tri["b"], tri["c"]])
        .value_counts()
        .rename_axis("id")
        .reset_index(name="triangles")
    )
    return counts


def triangle_count(edges: Dataset) -> int:
    """Global triangle count of the undirected simple graph underlying the
    (src, dst) Dataset."""
    canon = canonical_edges(edges)
    n_edges = canon.count()
    if n_edges <= LOCAL_EDGE_THRESHOLD:
        df = canon.to_pandas()
        return int(_count_local(df, per_vertex=False))
    return int(_triangles_distributed(canon, per_vertex=False))


def triangles_per_vertex(edges: Dataset) -> Dataset:
    """Per-vertex incident-triangle counts (vertices in no triangle omitted;
    left-join against the vertex set to fill zeros when needed)."""
    import ray.data as rd

    canon = canonical_edges(edges)
    n_edges = canon.count()
    if n_edges <= LOCAL_EDGE_THRESHOLD:
        counts = _count_local(canon.to_pandas(), per_vertex=True)
        return rd.from_pandas(counts)
    return _triangles_distributed(canon, per_vertex=True)


def _triangles_distributed(canon: Dataset, per_vertex: bool, num_partitions: int = 32):
    """Dataset-join wedge closure. Degree-ordered orientation via a degree
    aggregate + two joins; wedges stream through the second join without
    materializing."""
    from ray.data.aggregate import Count, Sum

    from ...stages.edges import add_reversed_edges

    deg = (
        add_reversed_edges(canon)
        .groupby("src")
        .aggregate(Count(alias_name="deg"))
        .map_batches(lambda t: t.rename_columns(["v", "deg"]), batch_format="pyarrow")
    )
    e = canon.join(
        deg.map_batches(lambda t: t.rename_columns(["src", "deg_s"]), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
    ).join(
        deg.map_batches(lambda t: t.rename_columns(["dst", "deg_d"]), batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
    )

    def orient(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        ds_ = t.column("deg_s").to_numpy()
        dd_ = t.column("deg_d").to_numpy()
        src_first = (ds_ < dd_) | ((ds_ == dd_) & (s < d))
        return pa.table(
            {"a": np.where(src_first, s, d), "b": np.where(src_first, d, s)}
        )

    o = e.map_batches(orient, batch_format="pyarrow").materialize()
    o_b = o.map_batches(lambda t: t.rename_columns(["b", "c"]), batch_format="pyarrow")
    wedges = o.join(o_b, join_type="inner", num_partitions=num_partitions, on=("b",))
    o_ac = o.map_batches(lambda t: t.rename_columns(["a", "c"]), batch_format="pyarrow")
    tri = wedges.join(
        o_ac, join_type="inner", num_partitions=num_partitions, on=("a", "c")
    )
    if not per_vertex:
        return tri.count()
    flat = tri.map_batches(
        lambda t: pa.table(
            {
                "id": np.concatenate(
                    [
                        t.column("a").to_numpy(),
                        t.column("b").to_numpy(),
                        t.column("c").to_numpy(),
                    ]
                ),
                "one": np.ones(3 * t.num_rows, dtype=np.int64),
            }
        ),
        batch_format="pyarrow",
    )
    return flat.groupby("id").aggregate(Sum("one", alias_name="triangles"))
