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


@ray.remote
def _km_block_init(t: pa.Table, seed: int, k: int, vec_col: str, id_col: str):
    """Per-block candidate initial centroids: the k locally smallest
    blake2b(seed, id) hashes with their vectors."""
    from ..ids import hash64_array

    ids = t.column(id_col).to_pylist()
    V = np.array(t.column(vec_col).to_pylist(), dtype=np.float64)
    hs = hash64_array([f"{seed}:{i}" for i in ids])
    sel = np.argsort(hs, kind="stable")[:k]
    return hs[sel], V[sel]


@ray.remote
def _km_block_partial(t: pa.Table, centroids: np.ndarray, vec_col: str):
    """Per-block Lloyd partials: per-centroid vector sums + member counts
    (the map-side combine; the driver only merges k×dim partials)."""
    V = np.array(t.column(vec_col).to_pylist(), dtype=np.float64)
    k = len(centroids)
    if len(V) == 0:
        return np.zeros((k, centroids.shape[1])), np.zeros(k, np.int64)
    # ||v−c||² = ||v||² − 2 v·c + ||c||²; ||v||² constant per row → argmin
    # over (−2 v·c + ||c||²), no (n, k, dim) tensor
    d2 = -2.0 * (V @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
    assign = np.argmin(d2, axis=1)
    sums = np.zeros((k, V.shape[1]))
    np.add.at(sums, assign, V)
    return sums, np.bincount(assign, minlength=k)


def train_kmeans(
    ds: Dataset,
    k: int = 8,
    iterations: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> np.ndarray:
    """Driver-coordinated Lloyd's iterations over object-store-resident
    blocks: each iteration fans out per-block (Σ vectors, counts) partials
    per centroid and the driver merges k×dim arrays — the full vector
    matrix is never collected.  Deterministic: initial centroids are the k
    vectors with globally smallest blake2b(seed, id)."""
    blocks = ds.select_columns([id_col, vec_col]).materialize().to_arrow_refs()

    parts = ray.get(
        [_km_block_init.remote(b, seed, k, vec_col, id_col) for b in blocks]
    )
    hs = np.concatenate([p[0] for p in parts])
    cand = np.concatenate([p[1] for p in parts])
    centroids = cand[np.argsort(hs, kind="stable")[:k]].copy()

    for _ in range(iterations):
        cref = ray.put(centroids)
        partials = ray.get(
            [_km_block_partial.remote(b, cref, vec_col) for b in blocks]
        )
        sums = np.sum([p[0] for p in partials], axis=0)
        counts = np.sum([p[1] for p in partials], axis=0)
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz, None]
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


@ray.remote
def _lin_partials(t: pa.Table, feat_cols: list, target_col: str):
    """Per-block normal-equation partials: (X'X, X'y, n) with intercept."""
    X = np.column_stack(
        [np.ones(t.num_rows)]
        + [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in feat_cols]
    )
    y = t.column(target_col).to_numpy(zero_copy_only=False).astype(np.float64)
    return X.T @ X, X.T @ y, len(y)


def train_linear_regression(
    ds: Dataset, feature_cols: list, target_col: str
) -> np.ndarray:
    """Closed-form least squares (Regression.scala:26 analog): per-block
    X'X / X'y partials (d+1 × d+1 each — driver merges matrices, never
    rows), solved once.  Returns [intercept, coef...]."""
    blocks = ds.select_columns(list(feature_cols) + [target_col]).materialize().to_arrow_refs()
    parts = ray.get(
        [_lin_partials.remote(b, list(feature_cols), target_col) for b in blocks]
    )
    XtX = np.sum([p[0] for p in parts], axis=0)
    Xty = np.sum([p[1] for p in parts], axis=0)
    return np.linalg.solve(XtX, Xty)


@ray.remote
def _logit_grad(t: pa.Table, beta: np.ndarray, feat_cols: list, label_col: str):
    X = np.column_stack(
        [np.ones(t.num_rows)]
        + [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in feat_cols]
    )
    y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.float64)
    p = 1.0 / (1.0 + np.exp(-(X @ beta)))
    return X.T @ (p - y), len(y)


def train_logistic_regression(
    ds: Dataset,
    feature_cols: list,
    label_col: str,
    iterations: int = 100,
    lr: float = 1.0,
) -> np.ndarray:
    """Deterministic full-batch gradient descent
    (LogisticRegressionModelTrainer.scala:73 analog): per-iteration
    per-block gradient partials (d+1 vectors), merged on the driver.
    Returns [intercept, coef...]."""
    blocks = ds.select_columns(list(feature_cols) + [label_col]).materialize().to_arrow_refs()
    dim = len(feature_cols) + 1
    beta = np.zeros(dim)
    for _ in range(iterations):
        bref = ray.put(beta)
        parts = ray.get(
            [_logit_grad.remote(b, bref, list(feature_cols), label_col) for b in blocks]
        )
        grad = np.sum([p[0] for p in parts], axis=0)
        n = sum(p[1] for p in parts)
        beta = beta - lr * grad / max(n, 1)
    return beta


class LinearScorer:
    """Actor-pool scoring stage for the linear/logistic models — the
    ClassifyWithModel slot (model fetched once per actor in __init__)."""

    def __init__(self, beta_ref, feat_cols, id_col: str, logistic: bool = False,
                 out: str = "prediction"):
        self.beta = ray.get(beta_ref)
        self.feat_cols = list(feat_cols)
        self.id_col = id_col
        self.logistic = logistic
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        X = np.column_stack(
            [np.ones(t.num_rows)]
            + [
                t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in self.feat_cols
            ]
        )
        z = X @ self.beta
        if self.logistic:
            z = 1.0 / (1.0 + np.exp(-z))
        return pa.table({self.id_col: t.column(self.id_col), self.out: z})


def predict_with_model(
    ds: Dataset, beta: np.ndarray, feature_cols, id_col: str,
    logistic: bool = False, concurrency: int = 2,
) -> Dataset:
    ref = ray.put(np.asarray(beta, np.float64))
    return ds.map_batches(
        LinearScorer,
        fn_constructor_args=(ref, list(feature_cols), id_col, logistic),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )
