"""Fingerprinting — similarity-based entity matching between two id spaces
(Fingerprinting.scala:51, 377 LoC: candidate pairs scored by neighborhood
similarity, then a mutual-best matching).

Ray shape:
1. candidate generation + scoring: distinct-token inverted index across
   BOTH sides (one key shuffle on token), per-posting-list cross-side pair
   expansion, exact Jaccard against broadcast token counts — the same
   sub-quadratic pattern as dedup.jaccard_pairs, restricted to
   left×right pairs.
2. matching: deterministic greedy 1:1 assignment by
   (score desc, left asc, right asc) — a pinned, verifiable variant of the
   reference's mutual-best stabilization.  The candidate set is
   threshold-pruned and therefore small; the greedy step runs driver-side
   (the reference's final stabilization is similarly centralized per
   connected candidate component).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..stages.shuffle import grouped_aggregate, hash_partition
from ..util import round_away
from .text import tokenize


def candidate_scores(
    left: Dataset,
    right: Dataset,
    threshold: float = 0.5,
    col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """(left_id, right_id, score) for cross-side pairs with token-Jaccard
    ≥ threshold."""

    def words(side: int):
        def body(t: pa.Table) -> pa.Table:
            out_id, out_w = [], []
            for i, s in zip(t.column(id_col).to_pylist(), t.column(col).to_pylist()):
                ws = set(tokenize(s))
                out_id.extend([i] * len(ws))
                out_w.extend(sorted(ws))
            return pa.table(
                {
                    "id": pa.array(out_id, pa.int64()),
                    "word": pa.array(out_w, pa.string()),
                    "side": pa.array([side] * len(out_id), pa.int8()),
                }
            )

        return body

    wl = left.map_batches(words(0), batch_format="pyarrow", zero_copy_batch=True)
    wr = right.map_batches(words(1), batch_format="pyarrow", zero_copy_batch=True)
    w = wl.union(wr).materialize()

    counts = grouped_aggregate(
        w.map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"],
                    "side": t["side"],
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["side", "id"],
        [("one", "sum", "n")],
    )
    cnt_map = {}
    for b in counts.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for s, i, n in zip(
            b["side"].to_pylist(), b["id"].to_pylist(), b["n"].to_pylist()
        ):
            cnt_map[(s, i)] = n
    cnt_ref = ray.put(cnt_map)

    part = hash_partition(w, ["word"])

    def cross_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lid": pa.array([], pa.int64()), "rid": pa.array([], pa.int64()),
                 "one": pa.array([], pa.int64())}
            )
        word = t.column("word").to_pylist()
        ids = t.column("id").to_numpy()
        side = t.column("side").to_numpy()
        # group rows by word within the block (words are block-complete)
        from collections import defaultdict

        lids, rids = [], []
        by_word = defaultdict(lambda: ([], []))
        for wd, i, s in zip(word, ids.tolist(), side.tolist()):
            by_word[wd][s].append(i)
        for ls, rs in by_word.values():
            for a in ls:
                for b2 in rs:
                    lids.append(a)
                    rids.append(b2)
        return pa.table(
            {
                "lid": pa.array(lids, pa.int64()),
                "rid": pa.array(rids, pa.int64()),
                "one": pa.array(np.ones(len(lids), np.int64)),
            }
        )

    common = grouped_aggregate(
        part.map_batches(cross_pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["lid", "rid"],
        [("one", "sum", "common")],
    )

    def finalize(t: pa.Table) -> pa.Table:
        cm = ray.get(cnt_ref)
        lid = t.column("lid").to_numpy()
        rid = t.column("rid").to_numpy()
        c = t.column("common").to_numpy().astype(np.float64)
        nl = np.fromiter((cm[(0, i)] for i in lid.tolist()), np.float64, len(lid))
        nr = np.fromiter((cm[(1, i)] for i in rid.tolist()), np.float64, len(rid))
        score = c / (nl + nr - c)
        keep = score >= threshold
        return pa.table(
            {
                "left_id": lid[keep],
                "right_id": rid[keep],
                "score": round_away(score[keep], 6),
            }
        )

    return common.map_batches(finalize, batch_format="pyarrow")


def fingerprint_match(
    left: Dataset,
    right: Dataset,
    threshold: float = 0.5,
    col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Deterministic greedy 1:1 matching over the threshold-pruned
    candidates. Returns (left_id, right_id, score)."""
    import ray.data as rd

    cands = candidate_scores(left, right, threshold, col, id_col)
    rows = []
    for b in cands.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        rows.extend(
            zip(b["score"].to_pylist(), b["left_id"].to_pylist(), b["right_id"].to_pylist())
        )
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    used_l, used_r = set(), set()
    out_l, out_r, out_s = [], [], []
    for s, l, r in rows:
        if l in used_l or r in used_r:
            continue
        used_l.add(l)
        used_r.add(r)
        out_l.append(l)
        out_r.append(r)
        out_s.append(s)
    return rd.from_arrow(
        pa.table(
            {
                "left_id": pa.array(out_l, pa.int64()),
                "right_id": pa.array(out_r, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )
    )
