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
    # seed=1: the md5-lower-64 init draws one vector from each planted
    # cluster, so Lloyd's must keep the four apart (k-means with a two-in-
    # one-cluster init can legitimately split; that's an init property,
    # not an engine defect)
    c1 = train_kmeans(ds, k=4, iterations=8, seed=1)
    c2 = train_kmeans(ds, k=4, iterations=8, seed=1)
    np.testing.assert_array_equal(c1, c2)  # deterministic training
    out = {r["vec_id"]: r["cluster"] for r in classify_with_model(ds, c1).take_all()}
    # members of the same true cluster land in the same learned cluster
    for base in range(4):
        got = {out[i] for i in range(base, 200, 4)}
        assert len(got) == 1


def test_approx_embeddedness_and_clustering_error_bounds():
    """HLL per-edge/per-vertex approximations track the exact operators
    (VERDICT r1 item #7)."""
    import ray.data as rd

    from lynxkite_ray.functions.graph.approx import (
        approx_clustering_coefficient,
        approx_embeddedness,
    )
    from lynxkite_ray.functions.graph.metrics import clustering_coefficient
    from lynxkite_ray.functions.graph.triangles import embeddedness

    rng = np.random.default_rng(53)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 150, 3000), rng.integers(0, 150, 3000))
            if a != b
        }
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64),
            }
        )
    )
    exact_e = {(r["src"], r["dst"]): r["common"] for r in embeddedness(ds).take_all()}
    approx_e = {
        (r["src"], r["dst"]): r["common"] for r in approx_embeddedness(ds, p=12).take_all()
    }
    assert set(approx_e) == set(exact_e)
    xs = np.array([exact_e[k] for k in sorted(exact_e)], dtype=np.float64)
    ys = np.array([approx_e[k] for k in sorted(exact_e)], dtype=np.float64)
    # dense random graph → sizeable intersections; HLL tracks them
    assert np.corrcoef(xs, ys)[0, 1] > 0.8
    assert np.mean(np.abs(xs - ys)) < 0.25 * max(np.mean(xs), 1.0) + 2.0

    exact_c = {r["id"]: r["clustering"] for r in clustering_coefficient(ds).take_all()}
    approx_c = {
        r["id"]: r["clustering"]
        for r in approx_clustering_coefficient(ds, p=12).take_all()
    }
    assert set(approx_c) == set(exact_c)
    xc = np.array([exact_c[k] for k in sorted(exact_c)])
    yc = np.array([approx_c[k] for k in sorted(exact_c)])
    assert np.corrcoef(xc, yc)[0, 1] > 0.7
    assert np.mean(np.abs(xc - yc)) < 0.15


def test_dispersion_matches_bruteforce():
    """Dispersion.scala:49 differential test vs a dict/set brute force."""
    import ray.data as rd

    from lynxkite_ray.functions.graph.dispersion import dispersion

    rng = np.random.default_rng(67)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 40, 300), rng.integers(0, 40, 300))
            if a != b
        }
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64),
            }
        )
    )
    got = {(r["src"], r["dst"]): r["dispersion"] for r in dispersion(ds).take_all()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def brute(u, v):
        src_n = adj[u] - {v}
        common = sorted(src_n & adj[v])
        score = 0.0
        for i in range(len(common)):
            a = common[i]
            ra = adj[a] & src_n
            for j in range(i + 1, len(common)):
                b = common[j]
                if b in ra or (ra & (adj[b] & src_n)):
                    continue
                score += 1.0
        return score

    assert set(got) == set(edges)
    for (u, v), val in got.items():
        assert val == brute(u, v), (u, v, val, brute(u, v))


def test_find_max_cliques_planted():
    import ray.data as rd

    from lynxkite_ray.functions.graph.cliques import find_max_cliques

    # K5 on 0-4, K4 on 10-13, one bridge edge, noise edge
    edges = []
    for grp in ([0, 1, 2, 3, 4], [10, 11, 12, 13]):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                edges.append((grp[i], grp[j]))
    edges += [(4, 10), (20, 21)]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64),
            }
        )
    )
    rows = find_max_cliques(ds, min_clique_size=3).take_all()
    cliques = {}
    for r in rows:
        cliques.setdefault(r["clique_id"], []).append(r["member"])
    sets = {tuple(sorted(v)) for v in cliques.values()}
    assert (0, 1, 2, 3, 4) in sets
    assert (10, 11, 12, 13) in sets
    assert all(len(c) >= 3 for c in sets)
    # deterministic
    rows2 = find_max_cliques(ds, min_clique_size=3).take_all()
    assert sorted((r["clique_id"], r["member"]) for r in rows2) == sorted(
        (r["clique_id"], r["member"]) for r in rows
    )


def test_sampled_histogram_tracks_exact():
    import ray.data as rd

    from lynxkite_ray.functions.aggregates import sampled_histogram

    rng = np.random.default_rng(29)
    vals = rng.normal(50, 20, 50_000)
    ds = rd.from_arrow(pa.table({"x": vals}))
    est = {
        r["bucket"]: r["est_count"]
        for r in sampled_histogram(ds, "x", 0.0, 100.0, buckets=10, fraction=0.2).take_all()
    }
    inr = vals[(vals >= 0.0) & (vals < 100.0)]  # exact-[lo, hi) semantics
    exact = np.bincount(((inr - 0.0) / 10.0).astype(int), minlength=10)
    for b in range(10):
        if exact[b] > 500:
            assert abs(est.get(b, 0) - exact[b]) / exact[b] < 0.15


def test_scale_free_generator_power_law_and_deterministic():
    from lynxkite_ray.sources.generators import scale_free_edges
    from lynxkite_ray.stages.edges import out_degree

    deg1 = {
        r["id"]: r["degree"]
        for r in out_degree(scale_free_edges(2000, 20000, seed=3)).take_all()
    }
    deg2 = {
        r["id"]: r["degree"]
        for r in out_degree(scale_free_edges(2000, 20000, seed=3)).take_all()
    }
    assert deg1 == deg2  # deterministic
    degs = np.array(sorted(deg1.values()))
    # heavy tail: max degree far above the mean; low-id vertices are hubs
    assert degs[-1] > 10 * degs.mean()
    top_ids = sorted(deg1, key=deg1.get, reverse=True)[:10]
    assert np.median(top_ids) < 100


def test_linear_and_logistic_trainers():
    import ray.data as rd

    from lynxkite_ray.functions.models import (
        predict_with_model,
        train_linear_regression,
        train_logistic_regression,
    )

    rng = np.random.default_rng(83)
    n = 20_000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = 3.0 + 2.0 * x1 - 1.5 * x2 + rng.normal(0, 0.01, n)
    ds = rd.from_arrow(
        pa.table({"id": np.arange(n), "x1": x1, "x2": x2, "y": y})
    ).repartition(8)
    beta = train_linear_regression(ds, ["x1", "x2"], "y")
    assert np.allclose(beta, [3.0, 2.0, -1.5], atol=0.01)
    preds = predict_with_model(ds, beta, ["x1", "x2"], "id").take(5)
    assert all("prediction" in r for r in preds)

    lab = (x1 + x2 > 0).astype(np.float64)
    ds2 = rd.from_arrow(
        pa.table({"id": np.arange(n), "x1": x1, "x2": x2, "lab": lab})
    ).repartition(8)
    b2 = train_logistic_regression(ds2, ["x1", "x2"], "lab", iterations=120, lr=2.0)
    p = 1.0 / (1.0 + np.exp(-(np.column_stack([np.ones(n), x1, x2]) @ b2)))
    acc = np.mean((p > 0.5) == (lab > 0.5))
    assert acc > 0.97
    # deterministic
    b3 = train_logistic_regression(ds2, ["x1", "x2"], "lab", iterations=120, lr=2.0)
    assert np.array_equal(b2, b3)


def test_decision_tree_trainer_axis_aligned():
    import ray.data as rd

    from lynxkite_ray.functions.models import classify_with_tree, train_decision_tree

    rng = np.random.default_rng(97)
    n = 12_000
    x1 = rng.uniform(0, 1, n)
    x2 = rng.uniform(0, 1, n)
    # axis-aligned AND target (greedy Gini learns it at depth 2; exact
    # balanced XOR has zero root gain for ANY split — inherent to CART)
    lab = ((x1 > 0.3) & (x2 > 0.6)).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"id": np.arange(n), "x1": x1, "x2": x2, "lab": lab})
    ).repartition(6)
    model = train_decision_tree(ds, ["x1", "x2"], "lab", max_depth=3)
    preds = {
        r["id"]: r["prediction"]
        for r in classify_with_tree(ds, model, "id").take_all()
    }
    acc = np.mean([preds[i] == lab[i] for i in range(n)])
    assert acc > 0.95
    model2 = train_decision_tree(ds, ["x1", "x2"], "lab", max_depth=3)
    assert model == model2  # deterministic


def test_pso_generator_power_law_clustering():
    from lynxkite_ray.functions.graph.metrics import clustering_coefficient
    from lynxkite_ray.sources.generators import pso_edges

    e1 = pso_edges(1500, m=2, seed=3).take_all()
    e2 = pso_edges(1500, m=2, seed=3).take_all()
    assert sorted((r["src"], r["dst"]) for r in e1) == sorted(
        (r["src"], r["dst"]) for r in e2
    )  # deterministic
    import collections

    deg = collections.Counter()
    for r in e1:
        deg[r["src"]] += 1
        deg[r["dst"]] += 1
    degs = np.array(sorted(deg.values()))
    assert degs[-1] > 8 * degs.mean()  # heavy tail (power-law-ish)
    # early (high-popularity) nodes are the hubs
    top = sorted(deg, key=deg.get, reverse=True)[:10]
    assert np.median(top) < 60


def test_majority_aggregator():
    import ray.data as rd

    from lynxkite_ray.functions.aggregates import Majority

    t = pa.table(
        {
            "g": [1, 1, 1, 2, 2, 2, 3, 3],
            "v": ["a", "a", "b", "x", "y", "z", "m", "m"],
        }
    )
    rows = {
        r["g"]: r["maj"]
        for r in rd.from_arrow(t)
        .groupby("g")
        .aggregate(Majority("v", 0.5, alias_name="maj"))
        .take_all()
    }
    assert rows[1] == "a"      # 2/3 > 0.5
    assert rows[2] is None     # 1/3 each — no majority
    assert rows[3] == "m"      # 2/2


def test_pca_matches_numpy():
    """Distributed covariance partials + pinned signs == numpy PCA."""
    import ray.data as rd

    from lynxkite_ray.functions.models import pca_transform, train_pca

    rng = np.random.default_rng(4)
    n, d = 500, 6
    # anisotropic data so components are well separated
    A = rng.standard_normal((d, d))
    V = rng.standard_normal((n, d)) @ (A * np.linspace(3, 0.3, d))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.ravel(), pa.float64()), d
                ),
            }
        )
    ).repartition(5)
    m = train_pca(ds, k=3)
    # numpy reference
    mu = V.mean(axis=0)
    cov = (V - mu).T @ (V - mu) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals)[:3]
    ref = evecs[:, order].T
    for i in range(3):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    np.testing.assert_allclose(m["components"], ref, atol=1e-8)
    np.testing.assert_allclose(m["explained_variance"], evals[order], atol=1e-8)
    out = {r["vec_id"]: np.array(r["pc"]) for r in pca_transform(ds, m).take_all()}
    np.testing.assert_allclose(out[0], (V[0] - mu) @ ref.T, atol=1e-8)
    assert len(out) == n


def test_gcn_classifier_transductive():
    """2-layer numpy GCN: deterministic across runs and recovers the
    community label of held-out vertices from graph structure alone."""
    import ray.data as rd

    from lynxkite_ray.functions.gcn import predict_gcn, train_gcn_classifier

    rng = np.random.default_rng(21)
    edges = set()
    for c in range(2):
        base = c * 20
        for _ in range(120):
            a, b = rng.integers(0, 20, 2)
            if a != b:
                edges.add((base + int(min(a, b)), base + int(max(a, b))))
    for _ in range(6):
        a, b = rng.integers(0, 20, 2)
        edges.add((int(a), 20 + int(b)))
    eds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64),
            }
        )
    )
    ids = np.arange(40, dtype=np.int64)
    # features: noisy 2-d signal aligned with the community
    comm = (ids >= 20).astype(np.float64)
    f1 = comm + 0.3 * rng.standard_normal(40)
    f2 = rng.standard_normal(40)  # pure noise column
    # label only half the vertices; the rest are held out
    label = np.where(ids % 2 == 0, comm.astype(np.int64), -1)
    feats = rd.from_arrow(
        pa.table({"id": ids, "f1": f1, "f2": f2, "label": label})
    )
    m1 = train_gcn_classifier(eds, feats, ["f1", "f2"], "label", epochs=150)
    m2 = train_gcn_classifier(eds, feats, ["f1", "f2"], "label", epochs=150)
    assert np.array_equal(m1["W1"], m2["W1"]) and np.array_equal(m1["W2"], m2["W2"])
    pred = {r["id"]: r["pred"] for r in predict_gcn(eds, feats, m1, ["f1", "f2"]).take_all()}
    held = [i for i in range(40) if label[i] < 0]
    acc = np.mean([pred[i] == int(comm[i]) for i in held])
    assert acc >= 0.9, acc


def test_tsne_deterministic_separates_clusters():
    """Pinned exact t-SNE: deterministic and separates planted clusters."""
    import ray.data as rd

    from lynxkite_ray.functions.tsne import tsne_embedding

    rng = np.random.default_rng(2)
    centers = rng.standard_normal((3, 8)) * 6
    V = centers[np.arange(180) % 3] + rng.standard_normal((180, 8)) * 0.3
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(180, dtype=np.int64),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(V.ravel(), pa.float64()), 8
                ),
            }
        )
    )
    o1 = {r["vec_id"]: np.array(r["tsne"]) for r in tsne_embedding(ds, iterations=300).take_all()}
    o2 = {r["vec_id"]: np.array(r["tsne"]) for r in tsne_embedding(ds, iterations=300).take_all()}
    assert all(np.array_equal(o1[k], o2[k]) for k in o1)
    Y = np.stack([o1[i] for i in range(180)])
    lab = np.arange(180) % 3
    centroid_gap = min(
        np.linalg.norm(Y[lab == a].mean(0) - Y[lab == b].mean(0))
        for a in range(3)
        for b in range(a + 1, 3)
    )
    within = np.mean([np.linalg.norm(Y[i] - Y[lab == lab[i]].mean(0)) for i in range(30)])
    assert centroid_gap > 2 * within


def test_gcn_regressor_transductive():
    """GCN regressor: deterministic; held-out targets recovered from a
    graph-correlated signal."""
    import ray.data as rd

    from lynxkite_ray.functions.gcn import (
        predict_gcn_regressor,
        train_gcn_regressor,
    )

    rng = np.random.default_rng(31)
    edges = set()
    for c in range(2):
        base = c * 20
        for _ in range(150):
            a, b = rng.integers(0, 20, 2)
            if a != b:
                edges.add((base + int(min(a, b)), base + int(max(a, b))))
    eds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([e[0] for e in edges], np.int64),
                "dst": np.array([e[1] for e in edges], np.int64),
            }
        )
    )
    ids = np.arange(40, dtype=np.int64)
    target_true = np.where(ids < 20, 10.0, -10.0)
    f1 = target_true / 10 + 0.2 * rng.standard_normal(40)
    y = np.where(ids % 2 == 0, target_true, np.nan)
    feats = rd.from_arrow(pa.table({"id": ids, "f1": f1, "y": y}))
    m1 = train_gcn_regressor(eds, feats, ["f1"], "y", epochs=200)
    m2 = train_gcn_regressor(eds, feats, ["f1"], "y", epochs=200)
    assert np.array_equal(m1["W1"], m2["W1"])
    pred = {r["id"]: r["pred"] for r in predict_gcn_regressor(eds, feats, m1, ["f1"]).take_all()}
    held = [i for i in range(40) if i % 2 == 1]
    err = np.mean([abs(pred[i] - target_true[i]) for i in held])
    assert err < 3.0, err


def test_effective_diameter_vs_exact_bfs():
    """HyperANF effective diameter within tolerance of the exact value
    computed from the full BFS distance distribution (same interpolated
    definition)."""
    import pyarrow as pa
    import ray.data as rd
    from collections import deque

    from lynxkite_ray.functions.graph import Graph
    from lynxkite_ray.functions.graph.hyperball import effective_diameter

    rng = np.random.default_rng(9)
    n = 300
    src = rng.integers(0, n, 1400).astype(np.int64)
    dst = rng.integers(0, n, 1400).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # symmetrize so the ball growth is over an undirected graph
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    g = Graph.from_edges(rd.from_arrow(pa.table({"src": s, "dst": d})))
    got = effective_diameter(g, q=0.9, max_diameter=30)

    # exact neighborhood function via BFS from every vertex
    adj = {}
    for a, b in zip(s.tolist(), d.tolist()):
        adj.setdefault(a, set()).add(b)
    vids = g.vids.tolist()
    maxd = 0
    dist_counts = {}
    for v in vids:
        seen = {v: 0}
        dq = deque([v])
        while dq:
            u = dq.popleft()
            for w in adj.get(u, ()):
                if w not in seen:
                    seen[w] = seen[u] + 1
                    dq.append(w)
        for t in seen.values():
            dist_counts[t] = dist_counts.get(t, 0) + 1
            maxd = max(maxd, t)
    nf = np.cumsum([dist_counts.get(t, 0) for t in range(maxd + 1)]).astype(float)
    target = 0.9 * nf[-1]
    i = int(np.searchsorted(nf, target))
    if i == 0:
        exact = 0.0
    else:
        span = nf[i] - nf[i - 1]
        exact = (i - 1) + ((target - nf[i - 1]) / span if span > 0 else 0.0)
    assert abs(got["effective_diameter"] - exact) <= 0.75, (
        got["effective_diameter"], exact,
    )


def test_segment_quality_hand_computed():
    """Triangle {0,1,2} in segment A plus a pendant 3 in segment B wired to
    0 and 1: every metric checked by hand."""
    from lynxkite_ray.functions.segmentation import segment_quality

    edges = rd.from_arrow(
        pa.table(
            {
                "src": np.array([0, 0, 1, 0, 1], np.int64),
                "dst": np.array([1, 2, 2, 3, 3], np.int64),
            }
        )
    )
    belongs = rd.from_arrow(
        pa.table(
            {
                "id": np.array([0, 1, 2, 3], np.int64),
                "segment": pa.array(["A", "A", "A", "B"]),
            }
        )
    )
    out = {
        r["segment"]: r
        for r in segment_quality(edges, belongs).take_all()
    }
    m = 5
    a = out["A"]
    # A: 3 members, triangle internal (3 edges), 2 cut edges (0-3, 1-3)
    assert a["size"] == 3 and a["internal_edges"] == 3 and a["cut_edges"] == 2
    assert a["coverage"] == round(3 / m, 6)
    assert a["density"] == 1.0           # 3 / C(3,2)
    assert a["expansion"] == round(2 / 3, 6)
    # vol(A) = 8, 2m - vol = 2 -> conductance = 2/2 = 1.0
    assert a["conductance"] == 1.0
    assert a["hub_dominance"] == 1.0     # max internal degree 2 / (3-1)
    b = out["B"]
    # B: single vertex, no internal edges, 2 cut edges
    assert b["size"] == 1 and b["internal_edges"] == 0 and b["cut_edges"] == 2
    assert b["density"] == 0.0 and b["hub_dominance"] == 0.0
    assert b["expansion"] == 2.0
    # vol(B) = 2, min(2, 8) = 2 -> conductance 1.0
    assert b["conductance"] == 1.0


# ------------------------------------------- closeness-family centralities


def _bfs_oracle(adj, s, V):
    """(reach incl. self, sum of distances) by deque BFS."""
    dist = {s: 0}
    dq = deque([s])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return len(dist), sum(dist.values())


def _random_graph(seed, V=40, E=160):
    rng = np.random.default_rng(seed)
    edges = list(
        {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in zip(rng.integers(0, V, E), rng.integers(0, V, E))
            if a != b
        }
    )
    # symmetric bundle (undirected semantics), plus isolated vertex V-1
    sym = edges + [(b, a) for a, b in edges]
    adj = defaultdict(set)
    for a, b in sym:
        adj[a].add(b)
    return sym, adj


def test_closeness_lin_avgdist_vs_bfs_oracle():
    from lynxkite_ray.functions.graph.closeness import (
        average_distance,
        closeness_centrality,
        lin_centrality,
    )

    sym, adj = _random_graph(11)
    g = Graph.from_edges(
        edges_ds(sym), extra_vertices=np.arange(45, dtype=np.int64)
    )
    V = g.num_vertices
    srcs = g.vids[:20]
    got_c = {r["id"]: r["closeness"] for r in closeness_centrality(g, srcs).take_all()}
    got_l = {r["id"]: r["lin"] for r in lin_centrality(g, srcs).take_all()}
    tot_pairs, tot_d = 0, 0
    for s in srcs:
        r, sumd = _bfs_oracle(adj, int(s), V)
        want_c = (r - 1) ** 2 / (sumd * (V - 1)) if r > 1 and sumd > 0 else 0.0
        want_l = r * r / sumd if sumd > 0 else 1.0
        assert abs(got_c[int(s)] - want_c) < 1e-5, s
        assert abs(got_l[int(s)] - want_l) < 1e-5, s
        tot_pairs += r - 1
        tot_d += sumd
    got_a = average_distance(g, srcs).take_all()[0]["avg_distance"]
    assert abs(got_a - tot_d / tot_pairs) < 1e-5


def test_closeness_isolated_and_pair():
    from lynxkite_ray.functions.graph.closeness import (
        closeness_centrality,
        lin_centrality,
    )

    # one edge 0-1 (symmetric), isolated vertex 2
    g = Graph.from_edges(
        edges_ds([(0, 1), (1, 0)]),
        extra_vertices=np.array([0, 1, 2], np.int64),
    )
    c = {r["id"]: r["closeness"] for r in closeness_centrality(g, g.vids).take_all()}
    li = {r["id"]: r["lin"] for r in lin_centrality(g, g.vids).take_all()}
    # 0 and 1: reach 2, sumd 1, n 3 -> (2-1)^2/(1*2) = 0.5
    assert c[0] == 0.5 and c[1] == 0.5 and c[2] == 0.0
    # lin: r^2/sumd = 4/1; isolated -> 1
    assert li[0] == 4.0 and li[1] == 4.0 and li[2] == 1.0


def test_laplacian_centrality_formula():
    from lynxkite_ray.functions.graph.closeness import laplacian_centrality

    sym, adj = _random_graph(7)
    vertices = rd.from_arrow(pa.table({"id": np.arange(42, dtype=np.int64)}))
    got = {
        r["id"]: r["lap"]
        for r in laplacian_centrality(edges_ds(sym), vertices).take_all()
    }
    deg = {v: len(adj[v]) for v in range(42)}
    for v in range(42):
        d = deg.get(v, 0)
        want = d * d + d + 2 * sum(deg[u] for u in adj[v])
        assert got[v] == want, v


def test_segment_stability_fragmentation_scalars():
    from lynxkite_ray.functions.segmentation import (
        segment_fragmentation,
        segment_stability,
        segmentation_scalars,
    )

    # segment A = {0,1,2,3}: triangle 0-1-2 plus isolated-in-A vertex 3
    #   (3's only edge goes to B) ; segment B = {4,5}: edge 4-5, plus 3-4 cut
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5)]
    belongs = [(0, "A"), (1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B")]
    e = rd.from_arrow(
        pa.table(
            {
                "src": np.array([a for a, _ in edges], np.int64),
                "dst": np.array([b for _, b in edges], np.int64),
            }
        )
    )
    b = rd.from_arrow(
        pa.table(
            {
                "id": np.array([i for i, _ in belongs], np.int64),
                "segment": pa.array([s for _, s in belongs], pa.string()),
            }
        )
    )

    st = {r["segment"]: r for r in segment_stability(e, b).take_all()}
    # A: 0,1,2 have 2 internal, 0 external -> stable; 3 has 0 own vs 1 in B
    #   -> unstable. stability = 3/4
    assert st["A"]["size"] == 4 and st["A"]["stable_nodes"] == 3
    assert st["A"]["stability"] == 0.75
    # B: 4 has 1 own vs 1 in A -> ties count as stable; 5 has 1 own only
    assert st["B"]["size"] == 2 and st["B"]["stable_nodes"] == 2
    assert st["B"]["stability"] == 1.0

    fr = {r["segment"]: r for r in segment_fragmentation(e, b).take_all()}
    # A: components {0,1,2} and {3} -> largest 3, frag 1 - 3/4
    assert fr["A"]["largest_component"] == 3 and fr["A"]["fragmentation"] == 0.25
    # B: {4,5} connected -> frag 0
    assert fr["B"]["largest_component"] == 2 and fr["B"]["fragmentation"] == 0.0

    sc = segmentation_scalars(e, b).take_all()[0]
    # intra: 0-1,1-2,0-2,4-5 = 4 of 5; cut: 3-4
    assert sc["coverage"] == 0.8 and sc["edge_cut"] == 1


def test_decision_tree_regressor_fits_piecewise_means():
    """SSE-reduction histogram CART (MachineLearningOperations.scala:246
    analog): recovers a piecewise-constant function's level means and is
    deterministic across retrains."""
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.functions.models import (
        classify_with_tree,
        train_decision_tree_regressor,
    )

    rng = np.random.default_rng(11)
    x = rng.uniform(0, 4, 800)
    levels = np.array([1.0, 5.0, -2.0, 10.0])
    y = levels[x.astype(int)] + rng.normal(0, 0.05, 800)
    ds = rd.from_arrow(
        pa.table({"rid": list(range(800)), "x": x, "y": y})
    ).repartition(5).materialize()
    m1 = train_decision_tree_regressor(ds, ["x"], "y", max_depth=4)
    m2 = train_decision_tree_regressor(ds, ["x"], "y", max_depth=4)
    # leaf means (and SSE gains) are float sums whose addition order
    # follows Ray's dynamic block splitting → 1-ulp retrain noise, the
    # same contract as kmeans centroids; split DECISIONS sit far from
    # that noise floor on this fixture, so the structure must agree
    assert m1["splits"] == m2["splits"] and m1["features"] == m2["features"]
    assert set(m1["leaves"]) == set(m2["leaves"])
    np.testing.assert_allclose(
        [m1["leaves"][k] for k in sorted(m1["leaves"])],
        [m2["leaves"][k] for k in sorted(m2["leaves"])],
        rtol=0,
        atol=1e-9,
    )
    pred = {r["rid"]: r["prediction"] for r in classify_with_tree(ds, m1, "rid").take_all()}
    p = np.array([pred[i] for i in range(800)])
    ss_res = ((p - y) ** 2).sum()
    ss_tot = ((y - y.mean()) ** 2).sum()
    assert 1 - ss_res / ss_tot > 0.99  # piecewise means recovered
    # leaves are float means, not class ids
    assert all(isinstance(v, float) for v in m1["leaves"].values())


def test_split_train_test_partition_stable_ratio():
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.functions.models import split_train_test

    ds = rd.from_arrow(pa.table({"k": list(range(2000))}))
    out = {r["k"]: r["role"] for r in split_train_test(ds, "k", 0.2, seed=3).take_all()}
    out2 = {
        r["k"]: r["role"]
        for r in split_train_test(
            rd.from_arrow(pa.table({"k": list(range(2000))})).repartition(7), "k", 0.2, seed=3
        ).take_all()
    }
    assert out == out2  # partition-stable
    frac = sum(1 for v in out.values() if v == "test") / 2000
    assert 0.15 < frac < 0.25


def test_diameter_lower_bound_vs_bfs():
    """diameter over all sources == exact diameter (brute-force BFS);
    a sampled source subset yields a valid lower bound."""
    from lynxkite_ray.functions.graph.closeness import diameter_lower_bound

    rng = np.random.default_rng(21)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 50, 120), rng.integers(0, 50, 120))
            if a != b
        }
    )
    sym = add_reversed_edges(edges_ds(edges))
    g = Graph.from_edges(sym)
    # brute force: max BFS eccentricity
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = 0
    for s in g.vids.tolist():
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for nb in adj[u]:
                if nb not in dist:
                    dist[nb] = dist[u] + 1
                    q.append(nb)
        want = max(want, max(dist.values()))
    full = diameter_lower_bound(g, g.vids).take_all()[0]
    assert full["diameter_lower"] == want
    sampled = diameter_lower_bound(g, g.vids[:5]).take_all()[0]
    assert 0 < sampled["diameter_lower"] <= want
