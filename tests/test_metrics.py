"""Clustering coefficient + shortest paths vs naive oracles."""

from collections import defaultdict, deque

import numpy as np
import pyarrow as pa
import ray.data as rd

from lynxkite_ray.functions.graph import Graph
from lynxkite_ray.functions.graph.metrics import clustering_coefficient, shortest_paths
from lynxkite_ray.stages.edges import add_reversed_edges


def edges_ds(edges):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64),
            }
        )
    )


def test_clustering_coefficient_small():
    # triangle 0-1-2 plus pendant 3 on vertex 2
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    out = {r["id"]: r["clustering"] for r in clustering_coefficient(edges_ds(edges)).take_all()}
    assert out[0] == 1.0 and out[1] == 1.0
    assert abs(out[2] - 1 / 3) < 1e-6
    assert out[3] == 0.0


def test_clustering_coefficient_random_vs_oracle():
    rng = np.random.default_rng(5)
    edges = list({(int(a), int(b)) for a, b in zip(rng.integers(0, 40, 200), rng.integers(0, 40, 200)) if a != b})
    und = {(min(a, b), max(a, b)) for a, b in edges}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    out = {r["id"]: r["clustering"] for r in clustering_coefficient(edges_ds(edges)).take_all()}
    for v, nbrs in adj.items():
        d = len(nbrs)
        tri = sum(1 for x in nbrs for y in nbrs if x < y and y in adj[x])
        want = tri / (d * (d - 1) / 2) if d >= 2 else 0.0
        assert abs(out[v] - want) < 1e-6, v


def test_shortest_paths_bfs_parity():
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (8, 9)]
    sym = add_reversed_edges(edges_ds(edges))
    g = Graph.from_edges(sym)
    dist = shortest_paths(g, np.array([0]), max_iterations=20)
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    want = {0: 0}
    q = deque([0])
    while q:
        u = q.popleft()
        for n in adj[u]:
            if n not in want:
                want[n] = want[u] + 1
                q.append(n)
    got = dict(zip(g.vids.tolist(), dist.tolist()))
    for v, d in want.items():
        assert got[v] == d
    assert np.isinf(got[8]) and np.isinf(got[9])  # other component unreachable


def test_random_walk_deterministic_and_reachable():
    from lynxkite_ray.functions.graph.sampling import random_walk_sample, snowball_sample

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (8, 9)]
    sym = add_reversed_edges(edges_ds(edges))
    g = Graph.from_edges(sym)
    a = sorted(map(tuple, (r.values() for r in random_walk_sample(g, np.array([0]), 6, 2, seed=5).take_all())))
    b = sorted(map(tuple, (r.values() for r in random_walk_sample(g, np.array([0]), 6, 2, seed=5).take_all())))
    assert a == b  # seed-deterministic
    visited = {r["id"] for r in random_walk_sample(g, np.array([0]), 6, 2, seed=5).take_all()}
    assert visited <= {0, 1, 2, 3, 4}  # never crosses into the other component

    ball = {r["id"]: r["dist"] for r in snowball_sample(g, np.array([0]), radius=1).take_all()}
    assert ball == {0: 0, 1: 1, 3: 1}


def test_coloring_validity():
    from lynxkite_ray.functions.graph.coloring import greedy_coloring

    rng = np.random.default_rng(9)
    edges = list({(int(a), int(b)) for a, b in zip(rng.integers(0, 60, 200), rng.integers(0, 60, 200)) if a != b})
    g = Graph.from_edges(edges_ds(edges))
    colors = dict(zip(g.vids.tolist(), greedy_coloring(g).tolist()))
    for a, b in edges:
        assert colors[a] != colors[b]
    assert min(colors.values()) == 0


def test_kmeans_scorer_deterministic_and_coherent():
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.functions.models import classify_with_model, train_kmeans

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 8)) * 5
    vecs = centers[np.arange(200) % 4] + rng.standard_normal((200, 8)) * 0.05
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": list(range(200)),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        )
    )
    c1 = train_kmeans(ds, k=4, iterations=8)
    c2 = train_kmeans(ds, k=4, iterations=8)
    np.testing.assert_array_equal(c1, c2)  # deterministic training
    out = {r["vec_id"]: r["cluster"] for r in classify_with_model(ds, c1).take_all()}
    # members of the same true cluster land in the same learned cluster
    for base in range(4):
        got = {out[i] for i in range(base, 200, 4)}
        assert len(got) == 1
