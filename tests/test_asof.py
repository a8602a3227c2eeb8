"""asof_join unit semantics: backward match, equal-ts inclusivity, pinned
ties, LEFT nulls, cross-key isolation — against a brute-force oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from lynxkite_ray.stages.join import asof_join


def _mk(rows, names):
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return rd.from_arrow(
        pa.table({n: pa.array(list(c), pa.int64()) for n, c in zip(names, cols)})
    )


def test_asof_join_crafted():
    # left: (lid, key, ts)
    left = _mk(
        [(1, 10, 100), (2, 10, 50), (3, 10, 5), (4, 20, 100), (5, 30, 100)],
        ["lid", "key", "ts"],
    )
    # right: (rid, key, ts) — key 10 has ties at ts=50; key 30 has no rows
    right = _mk(
        [(7, 10, 40), (8, 10, 50), (9, 10, 50), (11, 10, 99), (12, 20, 100)],
        ["rid", "key", "ts"],
    )
    out = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            left, right, by="key", on="ts",
            right_cols=["rid"], right_tie="rid",
        ).take_all()
    }
    assert out[1] == 11          # greatest ts <= 100
    assert out[2] == 9           # tie at ts=50 → larger rid wins
    assert out[3] is None        # nothing at or before ts=5
    assert out[4] == 12          # equal ts is inclusive
    assert out[5] is None        # key 30 has no right rows at all


def test_asof_join_random_vs_bruteforce():
    rng = np.random.default_rng(11)
    L = [(i, int(rng.integers(0, 8)), int(rng.integers(0, 1000))) for i in range(200)]
    R = [(i, int(rng.integers(0, 8)), int(rng.integers(0, 1000))) for i in range(300)]
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            _mk(L, ["lid", "key", "ts"]), _mk(R, ["rid", "key", "ts"]),
            by="key", on="ts", right_cols=["rid"], right_tie="rid",
        ).take_all()
    }
    assert len(got) == len(L)
    for lid, key, ts in L:
        cand = [(rts, rid) for rid, rkey, rts in R if rkey == key and rts <= ts]
        want = max(cand)[1] if cand else None
        assert got[lid] == want, (lid, key, ts)
