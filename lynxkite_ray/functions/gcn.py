"""GCN train / predict analog (reference: sphynx/python/
train_GCN_classifier.py + predict_GCN_classifier.py — torch-geometric on
the single-node python domain, dispatched from Sphynx.scala:17-201).

Same placement as the reference: training is single-node (gathered,
gated by LOCAL_EDGE_THRESHOLD like every Sphynx-domain op here), but in
deterministic numpy — seeded Xavier init + full-batch gradient descent,
so two runs produce identical weights (the torch original is
nondeterministic; pinning policy as in labelprop.py).  A 2-layer GCN:

    H = relu(Â X W1 + b1);  logits = Â H W2 + b2
    Â = D^-1/2 (A + I) D^-1/2  (symmetric renormalization, Kipf & Welling
    2017 — public)

Prediction is transductive (needs Â), so predict_gcn re-propagates with
the trained weights; scoring new feature batches against a FIXED graph
goes through the same call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..context import LOCAL_EDGE_THRESHOLD


def _gather_graph(edges: Dataset, features: Dataset, id_col: str,
                  feature_cols: list, label_col: str | None):
    """(vids, A-hat CSR-ish edge arrays (ui, vi, w), X, y) — y is -1 where
    unlabeled."""
    rows = []
    cols = [id_col] + list(feature_cols) + ([label_col] if label_col else [])
    for b in features.select_columns(cols).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        rows.append(b)
    ft = pa.concat_tables(rows)
    ids = ft.column(id_col).to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    X = np.column_stack(
        [
            ft.column(c).to_numpy(zero_copy_only=False).astype(np.float64)[order]
            for c in feature_cols
        ]
    )
    if label_col:
        import pyarrow.compute as pc

        lab = pc.fill_null(
            pc.cast(ft.column(label_col), pa.int64()), pa.scalar(-1, pa.int64())
        )
        y = lab.to_numpy(zero_copy_only=False)[order]
    else:
        y = np.full(len(ids), -1, np.int64)

    es, ed = [], []
    n_e = 0
    for b in edges.select_columns(["src", "dst"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        n_e += len(s)
        if n_e > LOCAL_EDGE_THRESHOLD:
            raise NotImplementedError(
                "gcn gathers the graph (single-node, reference-parity with "
                "the Sphynx python domain); coarsen above LOCAL_EDGE_THRESHOLD"
            )
        es.append(s)
        ed.append(d)
    s = np.concatenate(es) if es else np.empty(0, np.int64)
    d = np.concatenate(ed) if ed else np.empty(0, np.int64)
    ui = np.searchsorted(ids, s)
    vi = np.searchsorted(ids, d)
    ok = (ui < len(ids)) & (vi < len(ids))
    ui, vi = ui[ok], vi[ok]
    ok2 = (ids[ui] == s[ok]) & (ids[vi] == d[ok])
    return ids, ui[ok2], vi[ok2], X, y


def _ahat(ui: np.ndarray, vi: np.ndarray, V: int):
    """Symmetric-renormalized adjacency as COO arrays (r, c, w) including
    self-loops."""
    r = np.concatenate([ui, vi, np.arange(V)])
    c = np.concatenate([vi, ui, np.arange(V)])
    deg = np.bincount(r, minlength=V).astype(np.float64)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    w = dinv[r] * dinv[c]
    return r, c, w


def _prop(r, c, w, M):
    """Â @ M without materializing Â (O(E·d))."""
    out = np.zeros_like(M)
    np.add.at(out, c, M[r] * w[:, None])
    return out


def train_gcn_classifier(
    edges: Dataset,
    features: Dataset,
    feature_cols: list,
    label_col: str,
    id_col: str = "id",
    hidden: int = 16,
    epochs: int = 200,
    lr: float = 0.5,
    seed: int = 5,
) -> dict:
    """Returns {W1, b1, W2, b2, classes, ids-covered}.  Rows with a null /
    negative label are unlabeled (transductive setting)."""
    ids, ui, vi, X, y = _gather_graph(edges, features, id_col, feature_cols, label_col)
    V = len(ids)
    r, c, w = _ahat(ui, vi, V)
    classes = np.unique(y[y >= 0])
    k = len(classes)
    if k < 2:
        raise ValueError("train_gcn_classifier: need at least 2 labeled classes")
    ymap = np.searchsorted(classes, y[y >= 0])
    lab_idx = np.flatnonzero(y >= 0)
    Y = np.zeros((len(lab_idx), k))
    Y[np.arange(len(lab_idx)), ymap] = 1.0

    # standardize features (same preprocessing slot as the reference's
    # trainer); constants become zeros
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    Xn = (X - mu) / np.where(sd > 0, sd, 1.0)

    rng = np.random.default_rng(seed)
    d_in = Xn.shape[1]
    W1 = rng.standard_normal((d_in, hidden)) * np.sqrt(2.0 / (d_in + hidden))
    b1 = np.zeros(hidden)
    W2 = rng.standard_normal((hidden, k)) * np.sqrt(2.0 / (hidden + k))
    b2 = np.zeros(k)

    AX = _prop(r, c, w, Xn)
    nl = len(lab_idx)
    for _ in range(epochs):
        Z1 = AX @ W1 + b1
        H = np.maximum(Z1, 0.0)
        AH = _prop(r, c, w, H)
        Z2 = AH @ W2 + b2
        Z2 -= Z2.max(axis=1, keepdims=True)
        P = np.exp(Z2)
        P /= P.sum(axis=1, keepdims=True)
        dZ2 = np.zeros_like(P)
        dZ2[lab_idx] = (P[lab_idx] - Y) / nl
        dW2 = AH.T @ dZ2
        db2 = dZ2.sum(axis=0)
        dAH = dZ2 @ W2.T
        dH = _prop(r, c, w, dAH)  # Â symmetric
        dZ1 = dH * (Z1 > 0)
        dW1 = AX.T @ dZ1
        db1 = dZ1.sum(axis=0)
        W1 -= lr * dW1
        b1 -= lr * db1
        W2 -= lr * dW2
        b2 -= lr * db2
    return {
        "W1": W1, "b1": b1, "W2": W2, "b2": b2,
        "classes": classes, "mean": mu, "std": sd,
    }


def predict_gcn(
    edges: Dataset,
    features: Dataset,
    model: dict,
    feature_cols: list,
    id_col: str = "id",
) -> Dataset:
    """(id, pred, prob) for every vertex — transductive forward pass with
    the trained weights."""
    import ray.data as rd

    ids, ui, vi, X, _y = _gather_graph(edges, features, id_col, feature_cols, None)
    V = len(ids)
    r, c, w = _ahat(ui, vi, V)
    Xn = (X - model["mean"]) / np.where(model["std"] > 0, model["std"], 1.0)
    H = np.maximum(_prop(r, c, w, Xn) @ model["W1"] + model["b1"], 0.0)
    Z2 = _prop(r, c, w, H) @ model["W2"] + model["b2"]
    Z2 -= Z2.max(axis=1, keepdims=True)
    P = np.exp(Z2)
    P /= P.sum(axis=1, keepdims=True)
    best = P.argmax(axis=1)
    return rd.from_arrow(
        pa.table(
            {
                "id": ids,
                "pred": model["classes"][best],
                "prob": np.round(P[np.arange(V), best], 6),
            }
        )
    )


def train_gcn_regressor(
    edges: Dataset,
    features: Dataset,
    feature_cols: list,
    target_col: str,
    id_col: str = "id",
    hidden: int = 16,
    epochs: int = 200,
    lr: float = 0.3,
    seed: int = 5,
) -> dict:
    """train_GCN_regressor.py analog: same 2-layer propagation, scalar
    output head, MSE loss over labeled vertices (null target =
    unlabeled).  Deterministic (seeded init, full batch)."""
    import pyarrow.compute as pc_  # noqa: F401

    ids, ui, vi, X, _ = _gather_graph(edges, features, id_col, feature_cols, None)
    # targets gathered separately (float, null = unlabeled)
    rows = []
    for b in features.select_columns([id_col, target_col]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        rows.append(b)
    ft = pa.concat_tables(rows)
    tids = ft.column(id_col).to_numpy()
    torder = np.argsort(tids)
    yv = ft.column(target_col).to_numpy(zero_copy_only=False).astype(np.float64)[torder]
    labeled = ~np.isnan(yv)
    if labeled.sum() < 2:
        raise ValueError("train_gcn_regressor: need at least 2 labeled rows")

    V = len(ids)
    r, c, w = _ahat(ui, vi, V)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    Xn = (X - mu) / np.where(sd > 0, sd, 1.0)
    ymu = float(yv[labeled].mean())
    ysd = float(yv[labeled].std() or 1.0)
    yn = (yv - ymu) / ysd

    rng = np.random.default_rng(seed)
    d_in = Xn.shape[1]
    W1 = rng.standard_normal((d_in, hidden)) * np.sqrt(2.0 / (d_in + hidden))
    b1 = np.zeros(hidden)
    W2 = rng.standard_normal((hidden, 1)) * np.sqrt(2.0 / (hidden + 1))
    b2 = np.zeros(1)
    AX = _prop(r, c, w, Xn)
    lab_idx = np.flatnonzero(labeled)
    nl = len(lab_idx)
    for _ in range(epochs):
        Z1 = AX @ W1 + b1
        H = np.maximum(Z1, 0.0)
        AH = _prop(r, c, w, H)
        pred = (AH @ W2 + b2)[:, 0]
        dP = np.zeros(V)
        dP[lab_idx] = 2.0 * (pred[lab_idx] - yn[lab_idx]) / nl
        dW2 = AH.T @ dP[:, None]
        db2 = np.array([dP.sum()])
        dAH = dP[:, None] @ W2.T
        dH = _prop(r, c, w, dAH)
        dZ1 = dH * (Z1 > 0)
        dW1 = AX.T @ dZ1
        db1 = dZ1.sum(axis=0)
        W1 -= lr * dW1
        b1 -= lr * db1
        W2 -= lr * dW2
        b2 -= lr * db2
    return {
        "W1": W1, "b1": b1, "W2": W2, "b2": b2,
        "mean": mu, "std": sd, "y_mean": ymu, "y_std": ysd,
    }


def predict_gcn_regressor(
    edges: Dataset,
    features: Dataset,
    model: dict,
    feature_cols: list,
    id_col: str = "id",
) -> Dataset:
    """(id, pred) — transductive regression forward pass."""
    import ray.data as rd

    ids, ui, vi, X, _ = _gather_graph(edges, features, id_col, feature_cols, None)
    V = len(ids)
    r, c, w = _ahat(ui, vi, V)
    Xn = (X - model["mean"]) / np.where(model["std"] > 0, model["std"], 1.0)
    H = np.maximum(_prop(r, c, w, Xn) @ model["W1"] + model["b1"], 0.0)
    pred = (_prop(r, c, w, H) @ model["W2"] + model["b2"])[:, 0]
    return rd.from_arrow(
        pa.table(
            {
                "id": ids,
                "pred": np.round(pred * model["y_std"] + model["y_mean"], 6),
            }
        )
    )
