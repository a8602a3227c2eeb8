"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup — the training-data-pipeline dedup suite.

Scale shapes:
- exact: content-hash column (vectorized) → hash shuffle → min-id per hash
- MinHash-LSH: signatures per batch (numpy universal hashing) → explode to
  (band, band_hash) rows → groupby buckets → candidate pairs → exact-Jaccard
  verify → min-label connected components over the dup graph
- n-gram Jaccard: inverted-index self-join (word → doc) with per-pair
  common counts — the exact path; LSH is its sub-quadratic filter
- embedding near-dup: block × broadcast-matrix cosine (numpy matmul);
  the IVF/LSH bucketed variant lives in functions/similarity.py

Reference kinship: Fingerprinting.scala:51 is LynxKite's similarity-based
entity matching; these operators are the Ray-native generalization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ..util import round_away
from ray.data.aggregate import Count, Min, Sum

from ..ids import hash64_array
from .text import tokenize

# ------------------------------------------------------------------ exact


def exact_dedup(ds: Dataset, col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(id, text_md5) of the KEPT representative per exact-duplicate group
    (min id — StripDuplicateEdges-style deterministic keep-one)."""

    def with_md5(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(s.encode("utf-8")).hexdigest() for s in t.column(col).to_pylist()
        ]
        return pa.table(
            {id_col: t.column(id_col), "text_md5": pa.array(hs, pa.string())}
        )

    from ..stages.shuffle import grouped_aggregate

    h = ds.map_batches(with_md5, batch_format="pyarrow", zero_copy_batch=True)
    kept = grouped_aggregate(h, ["text_md5"], [(id_col, "min", id_col)])
    return kept.select_columns([id_col, "text_md5"])


# ------------------------------------------------------------- minhash/LSH


class MinHasher:
    """Stateful batch stage: word-k-shingle MinHash signatures.
    Permutation parameters are derived from the seed once per actor."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 7,
                 col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.MERSENNE, num_perm, dtype=np.int64)
        self.b = rng.integers(0, self.MERSENNE, num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.col = col
        self.id_col = id_col

    def shingle_hashes(self, text: str) -> np.ndarray:
        toks = tokenize(text)
        if len(toks) < self.k:
            shingles = [" ".join(toks)] if toks else [""]
        else:
            shingles = [" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)]
        return np.unique(hash64_array(shingles))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        # universal hash h_i(x) = (a_i * x + b_i) mod p, then min over shingles
        x = sh.astype(np.uint64)[:, None]
        prod = (x * self.a.astype(np.uint64)[None, :] + self.b.astype(np.uint64)[None, :])
        vals = prod % np.uint64(self.MERSENNE)
        return vals.min(axis=0).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(s) for s in t.column(self.col).to_pylist()])
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.ravel(), pa.int64()), self.num_perm
                ),
            }
        )


def minhash_signatures(ds: Dataset, num_perm=128, shingle_k=3, seed=7,
                       col="text", id_col="doc_id", concurrency=2) -> Dataset:
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, shingle_k=shingle_k, seed=seed, col=col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def lsh_candidate_pairs(sigs: Dataset, bands: int = 32, id_col: str = "doc_id") -> Dataset:
    """Signatures → banded bucket keys → per-bucket candidate pairs
    (src < dst, distinct). The bucket groupby is THE shuffle; buckets are
    (band_idx, band_hash) so hot shingle content salts across bands."""
    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        sig = np.stack(
            [np.asarray(x) for x in t.column("sig").to_pylist()]
        )  # (n, num_perm)
        n, p = sig.shape
        rows_per_band = p // bands
        band_ids = []
        band_hash = []
        doc_ids = []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            hh = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                hh = hh * np.uint64(1099511628211) + chunk[:, j].astype(np.uint64)
            band_ids.append(np.full(n, b, dtype=np.int64))
            band_hash.append(hh.astype(np.int64))
            doc_ids.append(ids)
        return pa.table(
            {
                "band": np.concatenate(band_ids),
                "bh": np.concatenate(band_hash),
                id_col: np.concatenate(doc_ids),
            }
        )

    buckets = sigs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    # Hash-partition by bucket key, then expand every bucket's pairs in one
    # vectorized pass per block (keys are block-complete after the shuffle).
    from ..stages.shuffle import distinct, hash_partition

    def block_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        band = t.column("band").to_numpy()
        bh = t.column("bh").to_numpy()
        ids = t.column(id_col).to_numpy()
        order = np.lexsort((ids, bh, band))
        band, bh, ids = band[order], bh[order], ids[order]
        bound = np.empty(len(ids), dtype=bool)
        bound[0] = True
        bound[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(bound)
        counts = np.diff(np.append(starts, len(ids)))
        src_out = []
        dst_out = []
        for size in np.unique(counts):
            if size < 2:
                continue
            gs = starts[counts == size]
            mat = ids[gs[:, None] + np.arange(size)[None, :]]
            iu, ju = np.triu_indices(int(size), 1)
            src_out.append(mat[:, iu].ravel())
            dst_out.append(mat[:, ju].ravel())
        if not src_out:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
        return pa.table(
            {"src": np.concatenate(src_out), "dst": np.concatenate(dst_out)}
        )

    cand = hash_partition(buckets, ["band", "bh"]).map_batches(
        block_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    return distinct(cand, ["src", "dst"])


def jaccard_pairs(
    ds: Dataset,
    threshold: float,
    col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    candidates: Dataset | None = None,
) -> Dataset:
    """Exact distinct-word Jaccard for all pairs ≥ threshold, via the
    inverted-index self-join (word → doc). When ``candidates`` is given
    (LSH output), pairs are pre-filtered to it (broadcast membership)."""

    def words(t: pa.Table) -> pa.Table:
        out_id = []
        out_w = []
        for i, s in zip(t.column(id_col).to_pylist(), t.column(col).to_pylist()):
            ws = set(tokenize(s))
            out_id.extend([i] * len(ws))
            out_w.extend(sorted(ws))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "word": pa.array(out_w, pa.string()),
            }
        )

    w = ds.map_batches(words, batch_format="pyarrow", zero_copy_batch=True).materialize()
    counts = w.groupby(id_col).aggregate(Count(alias_name="n_words"))

    # Inverted-index pair generation: one hash shuffle by word, then a
    # vectorized per-posting-list pair expansion (triu indices).  Equivalent
    # to the self-join on word but with one shuffle instead of a full join
    # exchange (the posting list is the unit of work).
    def posting_pairs(df):
        import pandas as pd

        ids = np.sort(df[id_col].to_numpy())
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)})
        iu, ju = np.triu_indices(n, 1)
        return pd.DataFrame({"src": ids[iu], "dst": ids[ju]})

    joined = w.groupby("word").map_groups(posting_pairs, batch_format="pandas")
    if candidates is not None:
        cand_keys = set()
        for batch in candidates.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            cand_keys.update(
                zip(batch["src"].to_pylist(), batch["dst"].to_pylist())
            )
        ref = ray.put(cand_keys)

        def cfilter(t: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            s = t.column("src").to_pylist()
            d = t.column("dst").to_pylist()
            mask = [((a_, b_) in keys) for a_, b_ in zip(s, d)]
            return t.filter(pa.array(mask))

        joined = joined.map_batches(cfilter, batch_format="pyarrow")

    # Per-block pre-combine of identical pairs before the (src, dst) shuffle.
    def precombine(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        bound = np.empty(len(s), dtype=bool)
        if len(s):
            bound[0] = True
            bound[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        starts = np.flatnonzero(bound)
        ones = np.ones(len(s), np.int64)
        return pa.table(
            {
                "src": s[starts],
                "dst": d[starts],
                "one": np.add.reduceat(ones, starts) if len(s) else ones,
            }
        )

    from ..stages.shuffle import grouped_aggregate

    common = grouped_aggregate(
        joined.map_batches(precombine, batch_format="pyarrow", zero_copy_batch=True),
        ["src", "dst"],
        [("one", "sum", "common")],
    )

    # Word counts per doc are tiny (one row per doc) → broadcast lookup,
    # not a shuffle join (HybridRDD.smallTableLookup analog).
    cnt_map = {}
    for b in counts.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        cnt_map.update(zip(b[id_col].to_pylist(), b["n_words"].to_pylist()))
    cnt_ref = ray.put(cnt_map)

    def finalize(t: pa.Table) -> pa.Table:
        cm = ray.get(cnt_ref)
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        c = t.column("common").to_numpy().astype(np.float64)
        ns = np.fromiter((cm[i] for i in s.tolist()), np.float64, len(s))
        nd = np.fromiter((cm[i] for i in d.tolist()), np.float64, len(d))
        j = c / (ns + nd - c)
        keep = j >= threshold
        return pa.table(
            {
                "src": s[keep],
                "dst": d[keep],
                "jaccard": round_away(j[keep], 6),
            }
        )

    return common.map_batches(finalize, batch_format="pyarrow")


def minhash_dedup(
    ds: Dataset,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 7,
    col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Full near-dup pipeline: MinHash → LSH buckets → candidate pairs →
    exact-Jaccard verify (word-shingle Jaccard via inverted index on the
    candidate set) → connected components over the dup graph → (id, rep).
    rep = min id of the duplicate cluster (rep == id for uniques)."""
    sigs = minhash_signatures(ds, num_perm, shingle_k, seed, col, id_col).materialize()
    cand = lsh_candidate_pairs(sigs, bands, id_col)
    verified = verify_pairs_jaccard(ds, cand, threshold, col, id_col)

    from .graph.core import Graph
    from .graph.components import connected_components

    ids = []
    for batch in ds.select_columns([id_col]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        ids.append(batch[id_col].to_numpy())
    all_ids = np.unique(np.concatenate(ids))
    edges = verified.select_columns(["src", "dst"])
    if edges.count() == 0:
        return_tab = pa.table({id_col: all_ids, "rep": all_ids})
        import ray.data as rd

        return rd.from_arrow(return_tab)
    g = Graph.from_edges(edges, extra_vertices=all_ids)
    labels = connected_components(g)
    import ray.data as rd

    return rd.from_arrow(pa.table({id_col: g.vids, "rep": labels}))


def verify_pairs_jaccard(
    ds: Dataset,
    pairs: Dataset,
    threshold: float,
    col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Exact word-set Jaccard for an explicit candidate-pair Dataset.

    The doc → token-set map is broadcast once (``ray.put``) and each pairs
    block verifies vectorized against it — O(|candidates|) instead of the
    all-pairs inverted index.  Assumes the token-set map fits a worker's
    heap (at larger scale, swap for a hash join of pairs against the token
    table keyed by src then dst)."""
    token_map: dict = {}
    for b in ds.select_columns([id_col, col]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        for i, s in zip(b[id_col].to_pylist(), b[col].to_pylist()):
            token_map[i] = frozenset(tokenize(s))
    ref = ray.put(token_map)

    def body(t: pa.Table) -> pa.Table:
        tm = ray.get(ref)
        s = t.column("src").to_pylist()
        d = t.column("dst").to_pylist()
        out_s, out_d, out_j = [], [], []
        for a_, b_ in zip(s, d):
            ta, tb = tm[a_], tm[b_]
            inter = len(ta & tb)
            union = len(ta) + len(tb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_s.append(a_)
                out_d.append(b_)
                out_j.append(j)
        return pa.table(
            {
                "src": pa.array(out_s, pa.int64()),
                "dst": pa.array(out_d, pa.int64()),
                "jaccard": round_away(np.array(out_j, dtype=np.float64), 6),
            }
        )

    return pairs.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------------- simhash


def simhash_batch(texts: list[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, s in enumerate(texts):
        toks = tokenize(s)
        if not toks:
            out[i] = 0
            continue
        uniq, cnt = np.unique(toks, return_counts=True)
        hs = hash64_array(list(uniq)).astype(np.uint64)
        bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.float64)
        votes = ((bits * 2 - 1) * cnt[:, None]).sum(axis=0)
        bitsel = (votes > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(bitsel << bit_idx)
    return out.astype(np.int64)


def simhash(ds: Dataset, col: str = "text", id_col: str = "doc_id") -> Dataset:
    def body(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col),
                "simhash": simhash_batch(t.column(col).to_pylist()),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ embedding near-dup


def embedding_neardup_pairs(
    ds: Dataset,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """All (src < dst) pairs with cosine ≥ threshold. Blocks stream against
    a broadcast normalized matrix (ray.put once); each block emits only its
    above-threshold pairs (block × V matmul, map-side filtered)."""
    mats = []
    ids = []
    for batch in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        ids.append(batch[id_col].to_numpy())
        mats.append(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
    all_ids = np.concatenate(ids)
    M = np.concatenate(mats)
    order = np.argsort(all_ids)
    all_ids, M = all_ids[order], M[order]
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((all_ids, Mn))

    def body(t: pa.Table) -> pa.Table:
        aid, mn = ray.get(ref)
        bid = t.column(id_col).to_numpy()
        B = np.array(t.column(vec_col).to_pylist(), dtype=np.float64)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        S = Bn @ mn.T
        src_i, dst_i = np.nonzero(S >= threshold)
        s_ids = bid[src_i]
        d_ids = aid[dst_i]
        keep = s_ids < d_ids
        return pa.table(
            {
                "src": s_ids[keep],
                "dst": d_ids[keep],
                "cos": round_away(S[src_i, dst_i][keep], 6),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)
