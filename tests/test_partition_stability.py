"""Partition-stability: the md5-contract operators must produce the SAME
result under ANY block structure — that is what makes their SQL oracles
(which know nothing about blocks) valid, and what makes results stable
when the driver runs at a different parallelism than the tests.

Hash/register/min-label operators are exactly partition-independent
(integer max/min/hash ops) → asserted equal.  KMeans centroids are float
sums whose ADDITION ORDER follows the block structure → asserted allclose
at 1e-9 (the oracle's argmin decisions sit ~6 orders of magnitude above
that noise floor).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _docs(texts, reps):
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    return ds.repartition(reps).materialize()


TEXTS = [
    f"alpha beta gamma delta epsilon zeta eta theta iota kappa doc{i} "
    f"lambda mu nu xi omicron pi rho sigma tau upsilon word{i % 7}"
    for i in range(60)
] + ["alpha beta gamma delta epsilon zeta eta theta iota kappa doc3 "
     "lambda mu nu xi omicron pi rho sigma tau upsilon word3"]  # near-dup of doc 3


@pytest.mark.parametrize("reps", [1, 7])
def test_minhash_dedup_partition_stable(reps):
    from lynxkite_ray.functions.dedup import minhash_dedup

    out = {
        r["doc_id"]: r["rep"]
        for r in minhash_dedup(_docs(TEXTS, reps), threshold=0.9).take_all()
    }
    base = {
        r["doc_id"]: r["rep"]
        for r in minhash_dedup(_docs(TEXTS, 3), threshold=0.9).take_all()
    }
    assert out == base


@pytest.mark.parametrize("reps", [1, 7])
def test_fingerprints_and_embeddings_partition_stable(reps):
    from lynxkite_ray.functions.embedding import embed_text
    from lynxkite_ray.functions.text import fingerprints

    f1 = {r["doc_id"]: r["fingerprint"] for r in fingerprints(_docs(TEXTS, reps)).take_all()}
    f2 = {r["doc_id"]: r["fingerprint"] for r in fingerprints(_docs(TEXTS, 3)).take_all()}
    assert f1 == f2
    e1 = {r["doc_id"]: tuple(r["embedding"]) for r in embed_text(_docs(TEXTS, reps), dim=16).take_all()}
    e2 = {r["doc_id"]: tuple(r["embedding"]) for r in embed_text(_docs(TEXTS, 3), dim=16).take_all()}
    assert e1 == e2  # per-row pure function: bit-identical


def _edges(reps):
    rng = np.random.default_rng(5)
    src = rng.integers(0, 60, 400)
    dst = rng.integers(0, 60, 400)
    keep = src != dst
    return (
        rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep]}))
        .repartition(reps)
        .materialize()
    )


@pytest.mark.parametrize("reps", [1, 6])
def test_hyperball_registers_partition_stable(reps):
    """Register max-merge is exact integer arithmetic: identical floats
    out regardless of how edges are blocked."""
    from lynxkite_ray.functions.graph import Graph
    from lynxkite_ray.functions.graph.hyperball import (
        effective_diameter,
        hyperball_harmonic,
    )

    g1 = Graph.from_edges(_edges(reps))
    g2 = Graph.from_edges(_edges(3))
    h1 = hyperball_harmonic(g1, max_diameter=6)
    h2 = hyperball_harmonic(g2, max_diameter=6)
    o1 = np.argsort(g1.vids)
    o2 = np.argsort(g2.vids)
    np.testing.assert_array_equal(g1.vids[o1], g2.vids[o2])
    np.testing.assert_array_equal(h1[o1], h2[o2])
    d1 = effective_diameter(g1, max_diameter=10)
    d2 = effective_diameter(g2, max_diameter=10)
    assert d1["effective_diameter"] == d2["effective_diameter"]
    assert d1["rounds"] == d2["rounds"]


@pytest.mark.parametrize("reps", [1, 6])
def test_kmeans_centroids_partition_allclose(reps):
    """Float partial sums follow the block structure: centroids agree to
    1e-9 (vs the O(0.1) distance gaps that decide assignments)."""
    from lynxkite_ray.functions.models import train_kmeans

    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((120, 8))

    def ds(r):
        return (
            rd.from_arrow(
                pa.table(
                    {
                        "vec_id": list(range(120)),
                        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
                    }
                )
            )
            .repartition(r)
            .materialize()
        )

    c1 = train_kmeans(ds(reps), k=4, iterations=5)
    c2 = train_kmeans(ds(3), k=4, iterations=5)
    np.testing.assert_allclose(c1, c2, rtol=0, atol=1e-9)


@pytest.mark.parametrize("reps", [1, 5])
def test_hash_sampling_partition_stable(reps):
    from lynxkite_ray.ids import hash_sample_mask

    ids = list(range(500))
    ds = rd.from_arrow(pa.table({"k": ids})).repartition(reps).materialize()

    def keep(t: pa.Table) -> pa.Table:
        vals = t.column("k").to_pylist()
        return t.filter(pa.array(hash_sample_mask([str(v) for v in vals], 0.2, 9)))

    got = sorted(
        r["k"] for r in ds.map_batches(keep, batch_format="pyarrow").take_all()
    )
    expected = [i for i in ids if hash_sample_mask([str(i)], 0.2, 9)[0]]
    assert got == expected and 40 <= len(got) <= 160
