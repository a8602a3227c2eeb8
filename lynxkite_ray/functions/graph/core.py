"""Graph handle: edge Dataset → index-space CSR-ish shards in the object
store, built once and reused across iterations (HybridBundle semantics —
the reference materializes/caches its skew-partitioned edge view for reuse,
HybridBundle.scala:35-60; our shards play the same role for the gather-
scatter loops).

Two regimes, mirroring the reference's small-graph fallback philosophy
(ConnectedComponents.scala:19,63-78):

- **dense** (V ≤ context.DENSE_VERTEX_THRESHOLD): the sorted distinct vertex
  id array is collected once; edges are mapped to dense indices inside
  ``map_batches`` (broadcast ``ray.put`` of the id array, fetched zero-copy
  per task); per-iteration state is a V-length numpy vector broadcast via
  ``ray.put`` and combined by summing per-shard partials. This is the fast
  path for any graph whose *vertex set* fits one machine (edges never do
  all-to-all; only V-sized vectors move).
- **dataset** (arbitrary V): pure Dataset ops per iteration — hash join
  ranks⋈edges on src, groupby(dst).sum — streaming at any scale. See
  pagerank.pagerank_dataset.

Edge blocks are re-blocked to ~context.ROWS_PER_BLOCK rows before shard
construction so the task fan-out is proportional to data (EntityIO.scala:
82-96 partition policy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ...context import DENSE_VERTEX_THRESHOLD, num_blocks_for
from ...state.checkpoint import lineage_key


def _collect_numpy(ds: Dataset, col: str) -> np.ndarray:
    parts = [
        b.column(col).to_numpy(zero_copy_only=False)
        for b in ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts)


class _IndexMapper:
    """map_batches stage: (src, dst[, weight]) ids → dense indices via a
    broadcast sorted id array (ray.put once, zero-copy ray.get per actor)."""

    def __init__(self, vids_ref, weight_col: str | None):
        self._ref = vids_ref
        self._vids = None
        self.weight_col = weight_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._vids is None:
            self._vids = ray.get(self._ref)
        vids = self._vids
        si = np.searchsorted(vids, t.column("src").to_numpy())
        di = np.searchsorted(vids, t.column("dst").to_numpy())
        cols = {"si": si.astype(np.int64), "di": di.astype(np.int64)}
        if self.weight_col is not None:
            w = t.column(self.weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
            keep = w > 0.0  # PageRank.scala:44 — drop non-positive weights
            cols = {"si": cols["si"][keep], "di": cols["di"][keep], "w": w[keep]}
        else:
            cols["w"] = np.ones(len(si), dtype=np.float64)
        return pa.table(cols)


@ray.remote
def _shard_wdeg(shard: pa.Table, num_vertices: int):
    si = shard.column("si").to_numpy()
    w = shard.column("w").to_numpy()
    return np.bincount(si, weights=w, minlength=num_vertices)


@ray.remote
def _sum_arrays(*arrs):
    return np.sum(arrs, axis=0)


@ray.remote
def _min_arrays(*arrs):
    out = arrs[0].copy()
    for a in arrs[1:]:
        np.minimum(out, a, out=out)
    return out


def tree_combine(refs, op: str = "sum", branch: int = 8) -> np.ndarray:
    """Tree-reduce a list of ObjectRefs of equal-length arrays without
    materializing them all on the driver (the per-iteration combine for
    wide shard fan-outs; driver-side linear summing is the serial
    bottleneck past ~8 shards)."""
    fn = _sum_arrays if op == "sum" else _min_arrays
    refs = list(refs)
    while len(refs) > branch:
        refs = [fn.remote(*refs[i : i + branch]) for i in range(0, len(refs), branch)]
    parts = ray.get(refs)
    if op == "sum":
        return np.sum(parts, axis=0)
    out = parts[0].copy()
    for a in parts[1:]:
        np.minimum(out, a, out=out)
    return out


class DatasetGraph:
    """Graph handle for the beyond-DENSE_VERTEX_THRESHOLD regime: edges and
    the vertex set stay Datasets end-to-end; the iterative algorithms
    dispatch to their Dataset-plane variants (pagerank_dataset /
    connected_components_dataset / label_propagation_dataset) and return
    Datasets rather than numpy vectors.  Construction never collects
    anything O(V) to the driver."""

    is_dense = False

    def __init__(self, edges: Dataset, vertices: Dataset, weight_col, num_edges, lineage):
        self.edges = edges  # materialized (src, dst[, weight]) Dataset
        self.vertices = vertices  # materialized distinct (id) Dataset
        self.weight_col = weight_col
        self.num_vertices = vertices.count()  # metadata on materialized ds
        self.num_edges = num_edges
        self.lineage = lineage


class Graph:
    """Immutable distributed graph: sorted vertex ids + edge shards (index
    space) + per-src weighted out-degree vector.  All object-store resident;
    the handle is cheap to pass around."""

    is_dense = True

    def __init__(self, vids, shard_refs, wdeg_ref, num_edges, lineage):
        self.vids = vids  # np.ndarray sorted int64
        self.shard_refs = shard_refs  # list[ObjectRef[pa.Table]]
        self.wdeg_ref = wdeg_ref  # ObjectRef[np.ndarray float64 V]
        self.num_vertices = len(vids)
        self.num_edges = num_edges
        self.lineage = lineage

    @classmethod
    def from_edges(
        cls,
        edges: Dataset,
        weight_col: str | None = None,
        extra_vertices: np.ndarray | None = None,
    ) -> "Graph":
        """Build from a deduplicated (src, dst[, weight]) Dataset.

        The vertex set is the union of src/dst ids (VerticesToEdges
        semantics) plus optional ``extra_vertices`` (isolated vertices —
        they matter for PageRank mass accounting).
        """
        cols = ["src", "dst"] + ([weight_col] if weight_col else [])
        edges = edges.select_columns(cols)

        # Distinct vertex ids: per-block unique inside map_batches, then one
        # driver-side merge of the (much smaller) per-block distinct sets.
        def block_unique(t: pa.Table) -> pa.Table:
            u = np.unique(
                np.concatenate(
                    [t.column("src").to_numpy(), t.column("dst").to_numpy()]
                )
            )
            return pa.table({"id": u})

        uniq = edges.map_batches(
            block_unique, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        # Σ per-block distinct counts is a free upper bound on V; only when
        # it exceeds the dense cap do we pay a distinct shuffle to learn the
        # true V — and only collect when that is provably collectable.
        upper_bound = uniq.count()
        if upper_bound > DENSE_VERTEX_THRESHOLD:
            import ray.data as rd

            from ...stages.shuffle import distinct as ds_distinct

            vset = uniq
            if extra_vertices is not None and len(extra_vertices):
                vset = vset.union(
                    rd.from_arrow(
                        pa.table({"id": np.asarray(extra_vertices, np.int64)})
                    )
                )
            vset = ds_distinct(vset, ["id"]).materialize()
            if vset.count() > DENSE_VERTEX_THRESHOLD:
                # Dataset-mode fallback: algorithms dispatch to the
                # streaming variants; nothing O(V) touches the driver.
                edges_mat = edges.materialize()
                n_edges = edges_mat.count()
                lineage = lineage_key(
                    "dataset-graph", vset.count(), n_edges, weight_col
                )
                return DatasetGraph(edges_mat, vset, weight_col, n_edges, lineage)
            vids = np.unique(_collect_numpy(vset, "id"))
        else:
            vids = np.unique(_collect_numpy(uniq, "id"))
            if extra_vertices is not None and len(extra_vertices):
                vids = np.unique(
                    np.concatenate([vids, np.asarray(extra_vertices, np.int64)])
                )

        vids_ref = ray.put(vids)
        mapped = edges.map_batches(
            _IndexMapper(vids_ref, weight_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # Sort by dst so every shard owns a contiguous dst range: iteration
        # partials are then range *slices* (assembled by concatenation,
        # O(V) per iteration) instead of full V-length vectors summed
        # (O(shards×V) — the combine would dominate past ~10 shards).
        mapped = mapped.materialize()
        n_rows = mapped.count()  # metadata only, already materialized
        shard_refs = (
            mapped.sort("di").repartition(num_blocks_for(n_rows)).to_arrow_refs()
        )

        V = len(vids)
        futures = [_shard_wdeg.remote(r, V) for r in shard_refs]
        wdeg = tree_combine(futures, op="sum") if futures else np.zeros(V)
        num_edges = n_rows
        lineage = lineage_key("graph", V, num_edges, weight_col)
        return cls(vids, shard_refs, ray.put(wdeg), num_edges, lineage)

    def gather_edges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Materialize index-space (si, di, w) on the driver — only valid
        under the local-fallback edge threshold (caller checks)."""
        tables = ray.get(list(self.shard_refs))
        si = np.concatenate([t.column("si").to_numpy() for t in tables])
        di = np.concatenate([t.column("di").to_numpy() for t in tables])
        w = np.concatenate([t.column("w").to_numpy() for t in tables])
        return si, di, w

    def scores_table(self, values: np.ndarray, name: str) -> pa.Table:
        return pa.table({"id": self.vids, name: values})

    def scores_dataset(self, values: np.ndarray, name: str) -> Dataset:
        import ray.data as rd

        return rd.from_arrow(self.scores_table(values, name))
