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
