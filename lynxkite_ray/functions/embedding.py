"""Text-embedding actor-pool stage (TextEmbeddingPython.scala:21 analog).

The reference ships text through a SentenceTransformer on the Sphynx
python domain; this container has no model weights or torch, so the stage
is PLUGGABLE: pass ``model=`` to plug a real encoder (anything with an
``encode(list[str]) -> ndarray`` method built inside ``__init__``), and
the default is a deterministic hashed n-gram projection — the classic
hashing trick (word unigrams + bigrams → signed buckets → L2 normalize).
The Ray-side shape is the real pattern regardless of the model: a
callable CLASS on ``map_batches`` (model built ONCE per actor in
``__init__``), batches in, ``(id, embedding)`` fixed-size-list batches
out — the same slot a GPU encoder drops into on a real cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .text import tokenize


class HashedNgramModel:
    """Deterministic fallback encoder: signed hashed unigram+bigram counts,
    L2-normalized.  md5-lower-64 per gram (the engine/oracle hash contract
    simhash, minhash and fingerprint64 share — DuckDB's md5_number_lower
    recomputes it); the top bit carries the sign so bucket collisions
    partially cancel (feature-hashing estimator).  Bucket sums are exact
    small integers and the normalization is a single sqrt + divide, so the
    SQL oracle reproduces the floats bit-exactly."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def encode(self, texts: list[str]) -> np.ndarray:
        from hashlib import md5

        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        frm = int.from_bytes
        for i, s in enumerate(texts):
            toks = tokenize(s)
            grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
            if not grams:
                continue
            h = np.fromiter(
                (
                    frm(md5(g.encode("utf-8", "surrogatepass")).digest()[8:], "little")
                    for g in grams
                ),
                np.uint64,
                len(grams),
            )
            sign = 1.0 - 2.0 * ((h >> np.uint64(63)) & np.uint64(1)).astype(np.float64)
            np.add.at(out[i], (h % np.uint64(self.dim)).astype(np.int64), sign)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        nz = norms[:, 0] > 0
        out[nz] /= norms[nz]
        return out


class TextEmbedder:
    """Actor-pool stage: the encoder is constructed once per actor."""

    def __init__(self, dim: int = 64, col: str = "text", id_col: str = "doc_id",
                 model_factory=None):
        self.model = model_factory() if model_factory is not None else HashedNgramModel(dim)
        self.dim = dim
        self.col = col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self.col).to_pylist()
        E = self.model.encode(texts)
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(E.ravel(), pa.float64()), E.shape[1]
                ),
            }
        )


def embed_text(
    ds: Dataset,
    dim: int = 64,
    col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
    model_factory=None,
) -> Dataset:
    """(id, embedding) for every document — deterministic by default, a
    real encoder via ``model_factory`` (called once per actor)."""
    from ..context import pool_size

    if concurrency is None:
        concurrency = pool_size()
    # small parquet inputs arrive as 1-2 blocks, which would starve the
    # actor pool (same spread as minhash_dedup); the projection is
    # materialized anyway before an all-actor stage
    ds = ds.select_columns([id_col, col]).materialize()
    if ds.num_blocks() < concurrency:
        ds = ds.repartition(concurrency).materialize()
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_kwargs=dict(
            dim=dim, col=col, id_col=id_col, model_factory=model_factory
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
