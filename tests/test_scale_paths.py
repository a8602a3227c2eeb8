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
