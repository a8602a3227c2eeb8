"""Broder bowtie decomposition of a directed graph (WWW'00, public):
classify every vertex relative to the largest strongly connected
component — CORE (the giant SCC), IN (reaches CORE), OUT (reached from
CORE), OTHER (tendrils / tubes / disconnected).

The canonical Common-Crawl link-graph report; built entirely from the
engine's own primitives: strongly_connected_components for the core, then
two seeded min-reach fixpoints (scc._directed_min_fixpoint with f=0 on the
core) for the IN/OUT sides.  Local gather path under SCC_LOCAL_EDGES runs
two vectorized numpy BFS sweeps instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from .scc import SCC_LOCAL_EDGES, _directed_min_fixpoint, strongly_connected_components


def _bfs_reach(indptr: np.ndarray, indices: np.ndarray, seeds: np.ndarray, V: int):
    """Vectorized frontier BFS: boolean reach-set from seeds along CSR."""
    reach = np.zeros(V, dtype=bool)
    reach[seeds] = True
    frontier = seeds
    while len(frontier):
        starts = indptr[frontier]
        cnt = indptr[frontier + 1] - starts
        total = int(cnt.sum())
        if total == 0:
            break
        pos = np.repeat(starts, cnt) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
        )
        nxt = np.unique(indices[pos])
        nxt = nxt[~reach[nxt]]
        reach[nxt] = True
        frontier = nxt
    return reach


def bowtie(edges: Dataset, max_rounds: int = 50) -> Dataset:
    """(id, region) with region ∈ {core, in, out, other}.  The core is the
    largest SCC (ties pinned by smallest component label)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ...context import default_partitions
    from ...stages.shuffle import COALESCE_BATCH, distinct

    scc = strongly_connected_components(edges, max_rounds=max_rounds).materialize()
    sizes = scc.groupby("scc").aggregate(Count(alias_name="n"))
    top = sizes.sort(["n", "scc"], descending=[True, False]).limit(1).take_all()
    if not top:
        return rd.from_arrow(
            pa.table({"id": np.empty(0, np.int64), "region": pa.array([], pa.string())})
        )
    core_label = top[0]["scc"]

    dedup = distinct(
        edges.map_batches(
            lambda t: t.select(["src", "dst"]).filter(
                pc.not_equal(t["src"], t["dst"])
            ),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
    ).materialize()

    if dedup.count() <= SCC_LOCAL_EDGES:
        return _bowtie_local(dedup, scc, core_label)

    labels0 = scc.map_batches(
        lambda t: pa.table(
            {
                "id": t["id"],
                "f": pc.if_else(
                    pc.equal(t["scc"], core_label),
                    pa.scalar(0, pa.int64()),
                    pa.scalar(1, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=COALESCE_BATCH,
    ).materialize()
    npart = default_partitions()
    fwd, f_ok = _directed_min_fixpoint(dedup, labels0, False, npart, max_rounds)
    bwd, b_ok = _directed_min_fixpoint(dedup, labels0, True, npart, max_rounds)
    if not (f_ok and b_ok):
        # a truncated reach vector misclassifies IN/OUT vertices more than
        # max_rounds hops from the core as "other" — refuse instead
        raise RuntimeError(
            f"bowtie: seeded min-reach fixpoint did not converge within "
            f"{max_rounds} rounds; raise max_rounds"
        )
    bwd = bwd.map_batches(
        lambda t: t.rename_columns(["id", "b"]),
        batch_format="pyarrow",
        batch_size=COALESCE_BATCH,
    )
    lab = fwd.join(
        bwd, join_type="inner", num_partitions=npart, on=("id",)
    ).join(
        scc.map_batches(
            lambda t: t.rename_columns(["id", "scc"]),
            batch_format="pyarrow",
            batch_size=COALESCE_BATCH,
        ),
        join_type="inner",
        num_partitions=npart,
        on=("id",),
    )

    def classify(t: pa.Table) -> pa.Table:
        is_core = pc.equal(t["scc"], core_label).to_numpy(zero_copy_only=False)
        reaches = t.column("f").to_numpy() == 0
        reached = t.column("b").to_numpy() == 0
        region = np.where(
            is_core,
            "core",
            np.where(
                reaches & ~reached,
                "in",
                np.where(reached & ~reaches, "out", "other"),
            ),
        )
        return pa.table(
            {"id": t["id"], "region": pa.array(region.tolist(), pa.string())}
        )

    return lab.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)


def _bowtie_local(dedup: Dataset, scc: Dataset, core_label: int) -> Dataset:
    from ..graph.triangles import _gather_canonical

    # caller gates on SCC_LOCAL_EDGES; assert here too since this helper
    # collects both the edge list and the scc labels to the driver
    n_edges = dedup.count()
    if n_edges > SCC_LOCAL_EDGES:
        raise ValueError(
            f"_bowtie_local: {n_edges} edges exceed SCC_LOCAL_EDGES "
            f"({SCC_LOCAL_EDGES}); use the Dataset path"
        )
    s, d = _gather_canonical(dedup)
    comp = {r["id"]: r["scc"] for r in scc.take_all()}
    vids = np.array(sorted(comp), dtype=np.int64)
    V = len(vids)
    si = np.searchsorted(vids, s)
    di = np.searchsorted(vids, d)
    labels = np.array([comp[v] for v in vids], dtype=np.int64)
    core = np.flatnonzero(labels == core_label)

    def csr(a, b):
        order = np.lexsort((b, a))
        aa, bb = a[order], b[order]
        indptr = np.zeros(V + 1, dtype=np.int64)
        np.cumsum(np.bincount(aa, minlength=V), out=indptr[1:])
        return indptr, bb

    fp, fi = csr(di, si)  # predecessors: walk edges backwards = "reaches core"
    rp, ri = csr(si, di)  # successors: walk edges forwards = "reached from core"
    reaches = _bfs_reach(fp, fi, core, V)
    reached = _bfs_reach(rp, ri, core, V)
    is_core = labels == core_label
    region = np.where(
        is_core,
        "core",
        np.where(
            reaches & ~reached, "in", np.where(reached & ~reaches, "out", "other")
        ),
    )
    return rd.from_arrow(
        pa.table({"id": vids, "region": pa.array(region.tolist(), pa.string())})
    )
