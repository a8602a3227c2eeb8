"""Model training + actor-pool scoring — the ClassifyWithModel /
PredictFromModel / KMeansClusteringModelTrainer analog (SURVEY §2.5:
expensive state loaded once per worker; ClassifyWithModel.scala:49,
KMeansClusteringModelTrainer.scala:25).

``train_kmeans`` is a small deterministic Lloyd's-iteration trainer
(seeded init by hashing row ids — no RNG-order dependence); the trained
model (centroid matrix) is shipped to the object store ONCE and scored by
an actor pool whose ``__init__`` fetches and normalizes it — the exact
shape a real (sklearn/torch) model scorer takes; only ``decode``-style
internals would change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def train_kmeans(
    ds: Dataset,
    k: int = 8,
    iterations: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> np.ndarray:
    """Driver-coordinated Lloyd's iterations: per-block partial sums per
    centroid (map-side combine) → driver update. Deterministic: initial
    centroids are the k vectors with smallest blake2b(seed, id)."""
    from ..ids import hash64_array

    ids, vecs = [], []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        ids.extend(b[id_col].to_pylist())
        vecs.append(np.array(b[vec_col].to_pylist(), dtype=np.float64))
    V = np.concatenate(vecs)
    hs = hash64_array([f"{seed}:{i}" for i in ids])
    centroids = V[np.argsort(hs)[:k]].copy()

    for _ in range(iterations):
        d2 = ((V[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = V[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


class KMeansScorer:
    """Actor-pool stage: the model ref is fetched ONCE per actor in
    __init__ (the per-worker expensive-state slot), batches are scored
    vectorized."""

    def __init__(self, centroids_ref, vec_col: str = "embedding", id_col: str = "vec_id"):
        self.centroids = ray.get(centroids_ref)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        V = np.array(t.column(self.vec_col).to_pylist(), dtype=np.float64)
        d2 = ((V[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1).astype(np.int64)
        dist = np.sqrt(d2[np.arange(len(V)), assign])
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "cluster": assign,
                "dist": dist,
            }
        )


def classify_with_model(
    ds: Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 2,
) -> Dataset:
    ref = ray.put(centroids)
    return ds.map_batches(
        KMeansScorer,
        fn_constructor_args=(ref, vec_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )
