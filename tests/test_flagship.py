"""End-to-end flagship pipeline + checkpoint/resume semantics."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from lynxkite_ray.functions.graph import Graph, pagerank
from lynxkite_ray.ids import hash64, normalize_url
from lynxkite_ray.pipelines.flagship import build_edges, flagship
from lynxkite_ray.sources.pages import page_out_links, pages_table
from lynxkite_ray.state.checkpoint import CheckpointManager, lineage_key

from .oracles import pagerank_oracle


def test_flagship_end_to_end(tmp_path):
    n = 250
    res = flagship(n_pages=n, iterations=4, checkpoint_root=str(tmp_path))
    # edge ground truth from the generator
    want = set()
    for i in range(n):
        src = normalize_url(f"http://site{i % 97}.example/p/{i}")
        for t in page_out_links(i, n, 42):
            want.add((hash64(src), hash64(normalize_url(t))))
    got = {
        (r["src"], r["dst"])
        for r in res["edges"].take_all()
    }
    assert got == want
    assert abs(res["rank_sum"] - res["num_vertices"]) < 1e-6
    # PageRank vs naive oracle on the same edge set
    oracle = pagerank_oracle([(s, d, 1.0) for s, d in want], res["graph"].vids.tolist(),
                             0.85, 4)
    np.testing.assert_allclose(
        res["ranks"], [oracle[v] for v in res["graph"].vids], atol=1e-6
    )
    assert res["num_components"] >= 1


def test_pagerank_checkpoint_resume(tmp_path):
    edges = [(i, (i * 3 + 1) % 50, 1.0) for i in range(50)] + [(7, 11, 1.0)]
    t = pa.table(
        {
            "src": np.array([e[0] for e in edges], np.int64),
            "dst": np.array([e[1] for e in edges], np.int64),
        }
    )
    g = Graph.from_edges(rd.from_arrow(t))
    full = pagerank(g, iterations=6)

    # simulate a crash after iteration 2: run 3 iters with checkpointing
    root_a = str(tmp_path / "a")
    pagerank(g, iterations=3, checkpoint_root=root_a)
    ck = CheckpointManager(root_a, "pagerank", "pagerank",
                          lineage_key(g.lineage, 0.85, 6, 0.0))
    # resume to 6 with the same root (different lineage per iterations param
    # would not resume, so rerun the 3-iter lineage first to assert manifests)
    ck3 = CheckpointManager(root_a, "pagerank", "pagerank",
                           lineage_key(g.lineage, 0.85, 3, 0.0))
    assert ck3.latest() == 2
    m = ck3.manifest(2)
    assert m["lineage"] == lineage_key(g.lineage, 0.85, 3, 0.0)
    assert "residual" in m["metrics"]

    # full 6-iter run with checkpointing, then resume-from-disk reproduces it
    root_b = str(tmp_path / "b")
    r1 = pagerank(g, iterations=6, checkpoint_root=root_b)
    np.testing.assert_allclose(r1, full, atol=0)
    # wipe nothing; a fresh call must resume at iter 6 (no-op) and agree
    r2 = pagerank(g, iterations=6, checkpoint_root=root_b)
    np.testing.assert_allclose(r2, r1, atol=0)

    # crash-resume equivalence: copy first 3 iters only, resume to 6
    import os
    import shutil

    root_c = str(tmp_path / "c")
    src_dir = os.path.join(root_b, "pagerank", "pagerank")
    dst_dir = os.path.join(root_c, "pagerank", "pagerank")
    os.makedirs(dst_dir)
    for name in sorted(os.listdir(src_dir))[:3]:
        shutil.copytree(os.path.join(src_dir, name), os.path.join(dst_dir, name))
    r3 = pagerank(g, iterations=6, checkpoint_root=root_c)
    np.testing.assert_allclose(r3, full, atol=0)


def test_lineage_mismatch_no_resume(tmp_path):
    edges = [(0, 1, 1.0), (1, 2, 1.0)]
    t = pa.table(
        {
            "src": np.array([e[0] for e in edges], np.int64),
            "dst": np.array([e[1] for e in edges], np.int64),
        }
    )
    g = Graph.from_edges(rd.from_arrow(t))
    pagerank(g, iterations=2, checkpoint_root=str(tmp_path))
    other = CheckpointManager(
        str(tmp_path), "pagerank", "pagerank", "different-lineage"
    )
    assert other.latest() is None  # foreign manifests are ignored


def test_dataset_plane_checkpoint_resume(tmp_path):
    """Kill/resume parity for the Dataset-plane algorithms: a run resumed
    from the first k checkpointed iterations must reproduce the
    uncheckpointed full run exactly (VERDICT r2 next-round #6)."""
    import os
    import shutil

    from lynxkite_ray.functions.graph.components import connected_components_dataset
    from lynxkite_ray.functions.graph.labelprop import label_propagation_dataset
    from lynxkite_ray.functions.graph.pagerank import pagerank_dataset

    rng = np.random.default_rng(3)
    n = 400
    src = rng.integers(0, n, 1500)
    dst = (src + rng.integers(1, n, 1500)) % n
    edges = rd.from_arrow(
        pa.table({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})
    )

    def as_map(ds, val):
        return {r["id"]: r[val] for r in ds.take_all()}

    def crash_resume(fn, stage_dir, val, **kw):
        full = as_map(fn(edges, **kw), val)
        root_b = str(tmp_path / f"{stage_dir}_b")
        r1 = as_map(fn(edges, checkpoint_root=root_b, **kw), val)
        assert r1 == full
        # copy only the first 2 iteration dirs → resume must complete it
        root_c = str(tmp_path / f"{stage_dir}_c")
        src_d = os.path.join(root_b, *stage_dir.split("/"))
        dst_d = os.path.join(root_c, *stage_dir.split("/"))
        os.makedirs(dst_d)
        for name in sorted(os.listdir(src_d))[:2]:
            shutil.copytree(os.path.join(src_d, name), os.path.join(dst_d, name))
        r3 = as_map(fn(edges, checkpoint_root=root_c, **kw), val)
        assert r3 == full

    crash_resume(pagerank_dataset, "pagerank_ds/pr-ds", "rank", iterations=5)
    crash_resume(
        connected_components_dataset, "cc_ds/cc-ds", "component", max_rounds=8
    )
    crash_resume(label_propagation_dataset, "lpa_ds/lpa-ds", "label", iterations=5)


def test_host_graph_pagerank_vs_oracle():
    """Host-level contraction + weighted PR vs a pure-python oracle built
    from the generator's ground-truth out-links (200 pages = the sf0.001
    page count, so this pins exactly what q_host_graph_pagerank serves)."""
    import re
    from collections import Counter

    from lynxkite_ray.pipelines.flagship import host_graph_pagerank

    n = 200
    host_re = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)")
    pairs = set()
    for i in range(n):
        src = normalize_url(f"http://site{i % 97}.example/p/{i}")
        for t in page_out_links(i, n, 42):
            pairs.add((src, normalize_url(t)))
    w = Counter()
    for s, d in pairs:
        w[(host_re.match(s).group(1), host_re.match(d).group(1))] += 1
    hosts = sorted({h for k in w for h in k})
    oracle = pagerank_oracle(
        [(s, d, float(c)) for (s, d), c in w.items()], hosts, 0.85, 10
    )

    got = {
        r["host"]: r["host_rank"]
        for r in host_graph_pagerank("/root/testdata/sf0.001").take_all()
    }
    assert set(got) == set(hosts)
    for h in hosts:
        assert abs(got[h] - oracle[h]) < 1e-5, (h, got[h], oracle[h])
