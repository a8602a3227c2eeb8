"""Optimal spanning forest (reference: "Find optimal spanning tree",
GraphComputationOperations.scala:251, solved by NetworKit's
RandomMaximumSpanningForest via networkit_compute_double_edge_attribute).

Deterministic Kruskal on the gathered canonical edge list behind the same
asserted LOCAL_EDGE_THRESHOLD gate the other whole-graph-resident ops use
(Steiner, cliques, local Louvain) — the operator REFUSES above the gate
rather than silently sampling.  The reference's "Random" tie-break (its
seed parameter) is pinned the engine's usual way: ties in weight order are
broken by md5-lower-64("seed:src:dst"), so the forest is a pure function
of (graph, weights, seed) — identical across partitionings, reruns and
cluster sizes.  The 100-TB path is Borůvka (per-component min-edge
selection is a grouped aggregate per round — the same shuffle shape as
connected components' large-star rounds); at reference parity the menu op
is single-machine NetworKit, which this matches.

Forest weight is unique even when the forest itself is not (equal-weight
ties) — the differential pytest pins the total against an independent
in-test Kruskal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ..dedup import _md5_lower64
from ...stages.edges import canonical_edges
from .triangles import _gather_canonical


def _find(parent: np.ndarray, x: int) -> int:
    root = x
    while parent[root] != root:
        root = parent[root]
    while parent[x] != root:  # path compression
        parent[x], x = root, parent[x]
    return root


def max_spanning_forest(
    edges: Dataset,
    weight_col: str | None = None,
    minimize: bool = False,
    seed: int = 1,
) -> Dataset:
    """(src, dst, weight, in_tree) per canonical src<dst edge; in_tree is
    1.0/0.0 (the reference exposes the result as a Double edge
    attribute)."""
    if weight_col is None:
        canon = canonical_edges(edges)
        if canon.count() > LOCAL_EDGE_THRESHOLD:
            raise NotImplementedError(
                "max_spanning_forest gathers the canonical edge list (Kruskal "
                "union-find is whole-graph state; NetworKit parity). Above "
                "LKR_LOCAL_EDGES implement the Borůvka rounds described in "
                "the module docstring."
            )
        s, d = _gather_canonical(canon)
        w = np.ones(len(s), dtype=np.float64)
    else:
        from ...stages.shuffle import grouped_aggregate

        def canon_w(t: pa.Table) -> pa.Table:
            sa = t.column("src").to_numpy()
            da = t.column("dst").to_numpy()
            wa = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
            keep = sa != da
            sa, da, wa = sa[keep], da[keep], wa[keep]
            return pa.table(
                {
                    "src": np.minimum(sa, da),
                    "dst": np.maximum(sa, da),
                    "w": wa,
                }
            )

        # a multigraph's optimal forest only ever uses the BEST parallel
        # edge, so parallel edges collapse to max (min when minimizing)
        canon = grouped_aggregate(
            edges.map_batches(canon_w, batch_format="pyarrow", zero_copy_batch=True),
            ["src", "dst"],
            [("w", "min" if minimize else "max", "w")],
        ).materialize()
        if canon.count() > LOCAL_EDGE_THRESHOLD:
            raise NotImplementedError(
                "max_spanning_forest gathers the canonical edge list (Kruskal "
                "union-find is whole-graph state; NetworKit parity). Above "
                "LKR_LOCAL_EDGES implement the Borůvka rounds described in "
                "the module docstring."
            )
        parts = [
            (
                b["src"].to_numpy(),
                b["dst"].to_numpy(),
                b["w"].to_numpy(zero_copy_only=False).astype(np.float64),
            )
            for b in canon.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ]
        s = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        d = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
        w = np.concatenate([p[2] for p in parts]) if parts else np.empty(0)
    if len(s) == 0:
        e = np.empty(0, np.int64)
        return rd.from_arrow(
            pa.table({"src": e, "dst": e, "weight": np.empty(0), "in_tree": np.empty(0)})
        )
    tie = _md5_lower64([f"{seed}:{a}:{b}" for a, b in zip(s.tolist(), d.tolist())])
    key = w if minimize else -w
    order = np.lexsort((d, s, tie, key))  # weight, then seeded hash, then ids
    vids = np.unique(np.concatenate([s, d]))
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    parent = np.arange(len(vids), dtype=np.int64)
    in_tree = np.zeros(len(s), dtype=np.float64)
    for i in order.tolist():
        ra, rb = _find(parent, int(si[i])), _find(parent, int(di[i]))
        if ra != rb:
            parent[ra] = rb
            in_tree[i] = 1.0
    return rd.from_arrow(
        pa.table({"src": s, "dst": d, "weight": w, "in_tree": in_tree})
    )
