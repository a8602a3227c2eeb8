"""t-SNE analog (reference: sphynx/python/tsne.py — sklearn TSNE on the
single-node python domain).

sklearn is absent from this container and its Barnes-Hut t-SNE is
RNG-order nondeterministic anyway, so this is a pinned exact t-SNE (van
der Maaten & Hinton 2008 — public): binary-search perplexity calibration,
PCA initialization (deterministic, no random restart), exact O(N²)
gradient with early exaggeration + momentum.  Gated to N ≤ TSNE_MAX_N —
the same single-node regime as the reference.  When a real sklearn is
present, pass ``impl="sklearn"`` to use it instead (same call shape)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
from ray.data import Dataset

TSNE_MAX_N = int(os.environ.get("LKR_TSNE_MAX_N", 5_000))


def _hbeta(D: np.ndarray, beta: float):
    P = np.exp(-D * beta)
    s = P.sum()
    if s <= 0:
        return 0.0, np.zeros_like(P)
    H = np.log(s) + beta * (D * P).sum() / s
    return H, P / s


def _calibrated_p(X: np.ndarray, perplexity: float) -> np.ndarray:
    n = len(X)
    sq = (X**2).sum(axis=1)
    D = np.maximum(sq[:, None] - 2 * X @ X.T + sq[None, :], 0.0)
    P = np.zeros((n, n))
    logU = np.log(perplexity)
    for i in range(n):
        idx = np.concatenate([np.arange(i), np.arange(i + 1, n)])
        Di = D[i, idx]
        beta, lo, hi = 1.0, -np.inf, np.inf
        for _ in range(50):
            H, Pi = _hbeta(Di, beta)
            if abs(H - logU) < 1e-5:
                break
            if H > logU:
                lo = beta
                beta = beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi = beta
                beta = beta / 2 if lo == -np.inf else (beta + lo) / 2
        P[i, idx] = Pi
    P = (P + P.T) / (2 * n)
    return np.maximum(P, 1e-12)


def tsne_embedding(
    ds: Dataset,
    dim: int = 2,
    perplexity: float = 30.0,
    iterations: int = 500,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str = "pinned",
) -> Dataset:
    """(id, tsne fixed_size_list<float64, dim>)."""
    import ray.data as rd

    ids, vecs = [], []
    n = 0
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        n += b.num_rows
        if n > TSNE_MAX_N:
            raise NotImplementedError(
                "t-SNE is O(N²) single-node (reference parity with the "
                "Sphynx python domain); subsample above LKR_TSNE_MAX_N"
            )
        ids.append(b[id_col].to_numpy())
        vecs.extend(b[vec_col].to_pylist())
    all_ids = np.concatenate(ids) if ids else np.empty(0, np.int64)
    X = np.array(vecs, dtype=np.float64)
    order = np.argsort(all_ids)
    all_ids, X = all_ids[order], X[order]
    if len(X) == 0:
        return rd.from_arrow(
            pa.table({id_col: all_ids, "tsne": pa.array([], pa.list_(pa.float64()))})
        )

    if impl == "sklearn":
        from sklearn.manifold import TSNE  # raises if absent — explicit

        Y = TSNE(n_components=dim, perplexity=perplexity).fit_transform(X)
    else:
        nrows = len(X)
        perp = min(perplexity, max((nrows - 1) / 3.0, 2.0))
        P = _calibrated_p(X, perp)
        # PCA init — deterministic, pinned signs (same convention as
        # models.train_pca)
        Xc = X - X.mean(axis=0)
        _u, _s, vt = np.linalg.svd(Xc, full_matrices=False)
        comps = vt[:dim]
        for i in range(len(comps)):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        Y = (Xc @ comps.T) * 1e-4 / max(np.abs(Xc @ comps.T).max(), 1e-12)
        gains = np.ones_like(Y)
        inc = np.zeros_like(Y)
        for it in range(iterations):
            ex = 12.0 if it < 100 else 1.0
            mom = 0.5 if it < 250 else 0.8
            sq = (Y**2).sum(axis=1)
            num = 1.0 / (1.0 + np.maximum(sq[:, None] - 2 * Y @ Y.T + sq[None, :], 0.0))
            np.fill_diagonal(num, 0.0)
            Q = np.maximum(num / num.sum(), 1e-12)
            PQ = (ex * P - Q) * num
            grad = 4.0 * ((np.diag(PQ.sum(axis=1)) - PQ) @ Y)
            flip = np.sign(grad) != np.sign(inc)
            gains = np.where(flip, gains + 0.2, gains * 0.8).clip(0.01)
            inc = mom * inc - 200.0 * gains * grad
            Y = Y + inc
            Y = Y - Y.mean(axis=0)
    return rd.from_arrow(
        pa.table(
            {
                id_col: all_ids,
                "tsne": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.round(Y, 9).ravel(), pa.float64()), Y.shape[1]
                ),
            }
        )
    )
