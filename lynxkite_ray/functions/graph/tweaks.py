"""FindModularClusteringByTweaks analog (FindModularClusteringByTweaks
.scala:521, 279-520): iterative partition-local modularity tweaks with
cluster reshuffling between iterations.

The reference's loop: clusters are randomly dealt to partitions, each
partition refines the clusters it can see (vertex-level merge/move tweaks
against the global 2m denominator), and iteration stops when the smoothed
modularity increment drops below ``min_increment``.  Its result is
Random-seeded; exact-match verification forces a pinned variant (same
policy as labelprop.py): the cluster→partition deal is a deterministic
integer hash salted by the iteration index, vertices are visited in
ascending id order, ties break toward the smaller cluster id.  The
eigenvector cluster-split tweak (bestSplit, line 220) is intentionally
omitted — starting from singletons, merges/moves dominate and splits
almost never fire; the omission is documented divergence.

Everything stays on the Dataset plane: vertices, edges and membership are
Datasets, one hash shuffle per iteration co-locates each cluster's
vertices with the intra-partition edges (clusters never straddle
partitions, mirroring the reference's groupByKey on cluster id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_SMOOTH = 3  # reference smoothingLength


def _refine_partition(
    u: np.ndarray,
    v: np.ndarray,
    w: np.ndarray,
    vids: np.ndarray,
    cids: np.ndarray,
    deg: np.ndarray,
    total: float,
    max_passes: int = 10,
) -> tuple[np.ndarray, float]:
    """Vertex-level tweaks on one partition's induced subgraph: move each
    vertex to the connected cluster with the best modularity gain
    (mergeModularityChange semantics: ΔQ = 2·conn/total − 2·Σdeg_C·deg_v/
    total²), global ``total`` = Σ all degrees = 2m.  Returns (new cluster
    ids aligned with vids, modularity increase)."""
    n = len(vids)
    order = np.argsort(vids)
    vids_s, cids_s, deg_s = vids[order], cids[order], deg[order]
    # local CSR over intra-partition edges (self-loops excluded from
    # neighbor scoring, their weight already lives in deg); endpoints are
    # all members of this partition, so searchsorted is a total map
    keep = u != v
    uu = np.searchsorted(vids_s, u[keep])
    vv = np.searchsorted(vids_s, v[keep])
    ww = w[keep]
    srcs = np.concatenate([uu, vv])
    dsts = np.concatenate([vv, uu])
    ws = np.concatenate([ww, ww])
    o2 = np.argsort(srcs, kind="stable")
    srcs, dsts, ws = srcs[o2], dsts[o2], ws[o2]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(srcs, minlength=n), out=indptr[1:])

    # dense community codes (clusters are wholly inside this partition)
    ucid, comm = np.unique(cids_s, return_inverse=True)
    ctot = np.bincount(comm, weights=deg_s, minlength=len(ucid)).astype(np.float64)
    inc = 0.0
    for _ in range(max_passes):
        moves = 0
        for i in range(n):
            lo, hi = indptr[i], indptr[i + 1]
            if lo == hi:
                continue
            nb, wn = dsts[lo:hi], ws[lo:hi]
            ci = int(comm[i])
            nc = comm[nb]
            cand, inv = np.unique(nc, return_inverse=True)
            conn = np.bincount(inv, weights=wn)
            ctot[ci] -= deg_s[i]
            gains = 2.0 * conn / total - 2.0 * ctot[cand] * deg_s[i] / (total * total)
            stay = 0.0 - 2.0 * ctot[ci] * deg_s[i] / (total * total)
            pos = np.flatnonzero(cand == ci)
            if len(pos):
                stay = gains[pos[0]]
            best_i = np.lexsort((ucid[cand], -gains))[0]
            best_c, best_g = int(cand[best_i]), gains[best_i]
            if best_g > stay + 1e-12 and best_c != ci:
                comm[i] = best_c
                ctot[best_c] += deg_s[i]
                inc += best_g - stay
                moves += 1
            else:
                ctot[ci] += deg_s[i]
        if moves == 0:
            break
    out = np.empty(n, dtype=np.int64)
    out[order] = ucid[comm]
    return out, inc


def find_modular_clustering_by_tweaks(
    edges: Dataset,
    weight_col: str | None = None,
    max_iterations: int = 30,
    min_increment: float = 0.001,
    num_partitions: int | None = None,
) -> Dataset:
    """(id, cluster) with cluster = min member id.  See module docstring
    for the pinned divergences from the reference."""
    import ray.data as rd

    from ...context import default_partitions
    from ...stages.edges import vertices_from_edges
    from ...stages.shuffle import COALESCE_BATCH, grouped_aggregate, hash_partition

    if num_partitions is None:
        num_partitions = default_partitions()
    P = num_partitions
    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)

    # canonical undirected weighted edges (parallel edges summed)
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        if weight_col:
            w_ = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            w_ = np.ones(len(s), np.float64)
        return pa.table(
            {"u": np.minimum(s, d), "v": np.maximum(s, d), "w": w_}
        )

    ce = grouped_aggregate(
        edges.select_columns(cols).map_batches(canon, **mb),
        ["u", "v"],
        [("w", "sum", "w")],
        P,
    ).materialize()

    # global weighted degree (self-loops count twice) + total = 2m
    def degrows(t: pa.Table) -> pa.Table:
        u_ = t.column("u").to_numpy()
        v_ = t.column("v").to_numpy()
        w_ = t.column("w").to_numpy()
        return pa.table(
            {"id": np.concatenate([u_, v_]), "d": np.concatenate([w_, w_])}
        )

    deg = grouped_aggregate(
        ce.map_batches(degrows, **mb), ["id"], [("d", "sum", "deg")], P
    ).materialize()
    total = float(deg.sum("deg") or 0.0)
    if total == 0.0:
        verts = vertices_from_edges(edges)
        return verts.map_batches(
            lambda t: pa.table({"id": t["id"], "cluster": t["id"]}), **mb
        )

    # members: (id, cid, deg), init singleton
    members = deg.map_batches(
        lambda t: pa.table({"id": t["id"], "cid": t["id"], "deg": t["deg"]}), **mb
    ).materialize()

    recent: list[float] = []
    for it in range(max_iterations):
        salt = np.int64(it * 1_000_003 + 7)

        def with_pid(t: pa.Table, salt=salt) -> pa.Table:
            cid = t.column("cid").to_numpy()
            # deterministic "deal clusters to partitions" (the reference
            # uses Random(seed per iteration); we pin an integer mix)
            x = (cid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) + np.uint64(salt)
            x ^= x >> np.uint64(31)
            pid = (x % np.uint64(P)).astype(np.int64)
            return t.append_column("pid", pa.array(pid))

        mpid = members.map_batches(with_pid, **mb).materialize()
        vp = mpid.select_columns(["id", "pid"])
        # intra-partition edges: u and v in the same pid
        e1 = ce.join(
            vp.map_batches(lambda t: t.rename_columns(["u", "pu"]), **mb),
            join_type="inner",
            num_partitions=P,
            on=("u",),
        )
        e2 = e1.join(
            vp.map_batches(lambda t: t.rename_columns(["v", "pv"]), **mb),
            join_type="inner",
            num_partitions=P,
            on=("v",),
        )
        intra = e2.map_batches(
            lambda t: t.filter(pc.equal(t["pu"], t["pv"])), **mb
        ).map_batches(
            lambda t: pa.table(
                {
                    "pid": t["pu"],
                    "id": t["u"],
                    "cid": pa.nulls(t.num_rows, pa.int64()),
                    "deg": pa.nulls(t.num_rows, pa.float64()),
                    "v2": t["v"],
                    "w": t["w"],
                    "kind": pa.array(np.ones(t.num_rows, np.int8)),
                }
            ),
            **mb,
        )
        vrows = mpid.map_batches(
            lambda t: pa.table(
                {
                    "pid": t["pid"],
                    "id": t["id"],
                    "cid": t["cid"],
                    "deg": t["deg"],
                    "v2": pa.nulls(t.num_rows, pa.int64()),
                    "w": pa.nulls(t.num_rows, pa.float64()),
                    "kind": pa.array(np.zeros(t.num_rows, np.int8)),
                }
            ),
            **mb,
        )

        def refine(t: pa.Table, total=total) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        "id": pa.array([], pa.int64()),
                        "cid": pa.array([], pa.int64()),
                        "inc": pa.array([], pa.float64()),
                    }
                )
            kind = t.column("kind").to_numpy()
            ve = kind == 0
            vids = t.column("id").to_numpy()[ve]
            cids = t.column("cid").to_numpy(zero_copy_only=False)[ve]
            dg = t.column("deg").to_numpy(zero_copy_only=False)[ve]
            ee = kind == 1
            u_ = t.column("id").to_numpy()[ee]
            v_ = t.column("v2").to_numpy(zero_copy_only=False)[ee]
            w_ = t.column("w").to_numpy(zero_copy_only=False)[ee]
            new_cid, inc = _refine_partition(
                u_, v_, w_.astype(np.float64), vids, cids.astype(np.int64),
                dg.astype(np.float64), total,
            )
            out_inc = np.zeros(len(vids))
            sentinel_id = np.concatenate([vids, [-1]])
            sentinel_cid = np.concatenate([new_cid, [0]])
            sentinel_inc = np.concatenate([out_inc, [inc]])
            return pa.table(
                {"id": sentinel_id, "cid": sentinel_cid, "inc": sentinel_inc}
            )

        refined = (
            hash_partition(vrows.union(intra), ["pid"], P)
            .map_batches(refine, **mb)
            .materialize()
        )
        increase = float(
            refined.map_batches(
                lambda t: t.filter(pc.equal(t["id"], -1)), **mb
            ).sum("inc")
            or 0.0
        )
        new_members = refined.map_batches(
            lambda t: t.filter(pc.not_equal(t["id"], -1)).select(["id", "cid"]), **mb
        )
        members = (
            new_members.join(
                deg, join_type="inner", num_partitions=P, on=("id",)
            )
            .map_batches(
                lambda t: pa.table(
                    {"id": t["id"], "cid": t["cid"], "deg": t["deg"]}
                ),
                **mb,
            )
            .materialize()
        )
        recent = (recent + [increase])[-_SMOOTH:]
        if len(recent) == _SMOOTH and sum(recent) <= min_increment * _SMOOTH:
            break

    # normalize: cluster label = min member id; attach isolated vertices
    mins = grouped_aggregate(
        members.select_columns(["id", "cid"]), ["cid"], [("id", "min", "cluster")], P
    )
    out = members.join(mins, join_type="inner", num_partitions=P, on=("cid",))
    out = out.map_batches(
        lambda t: pa.table({"id": t["id"], "cluster": t["cluster"]}), **mb
    )
    verts = vertices_from_edges(edges)
    iso = verts.join(
        members.map_batches(lambda t: pa.table({"id": t["id"], "has": t["cid"]}), **mb),
        join_type="left_outer",
        num_partitions=P,
        on=("id",),
    ).map_batches(
        lambda t: t.filter(pc.is_null(t["has"])).select(["id"]), **mb
    ).map_batches(
        lambda t: pa.table({"id": t["id"], "cluster": t["id"]}), **mb
    )
    return out.union(iso)
