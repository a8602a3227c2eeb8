"""Join strategies (SURVEY §2.6):

- ``hash_join`` — Ray Data's hash-partitioned ``Dataset.join`` (the
  sortedJoin analog; both sides large).
- ``broadcast_join`` — small side ``ray.put`` ONCE as an Arrow table,
  joined inside ``map_batches`` per block with ``pa.Table.join`` (Acero's
  C++ hash join; HybridRDD.smallTableLookup analog, HybridRDD.scala:
  95-100): no shuffle of the big side, no pandas conversion.
- ``semi_join`` / ``anti_join`` — broadcast key-set membership filter
  (FilterByTable.scala:19 / NotFilter composition), vectorized with
  ``pyarrow.compute.is_in``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def hash_join(
    left: Dataset,
    right: Dataset,
    on,
    how: str = "inner",
    num_partitions: int | None = None,
    right_on=None,
) -> Dataset:
    kind = {
        "inner": "inner",
        "left": "left_outer",
        "right": "right_outer",
        "outer": "full_outer",
    }[how]
    if num_partitions is None:
        from ..context import default_partitions

        num_partitions = default_partitions()
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (
        None
        if right_on is None
        else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    )
    return left.join(
        right, join_type=kind, num_partitions=num_partitions, on=on, right_on=right_on
    )


# Per-worker-process cache of deserialized broadcast tables, so stateless
# tasks don't re-deserialize the small side per batch.  Keyed by ObjectRef
# hex.  Bounded LRU: a long-lived worker only needs the broadcast side of
# the stage it is currently executing, so old entries are evicted instead
# of accumulating one copy per join ever run in the session.
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 4


def _fetch_small(small_ref):
    key = small_ref.hex()
    if key not in _BCAST_CACHE:
        while len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = ray.get(small_ref)
    else:
        _BCAST_CACHE[key] = _BCAST_CACHE.pop(key)  # refresh LRU position
    return _BCAST_CACHE[key]


def broadcast_join(
    big: Dataset, small, on, how: str = "inner", right_on=None, concurrency=None
) -> Dataset:
    """``small`` is an Arrow table / pandas DataFrame (or a Dataset small
    enough to collect). Shipped to the object store once as Arrow; every
    block of ``big`` runs Acero's C++ hash join against it locally — the
    skew-immune small-side path, zero-copy end to end.

    Only ``inner`` and ``left`` are expressible per-block (a right/full
    outer over a broadcast side would emit unmatched right rows once per
    block); use ``hash_join`` for those."""
    join_type = {"inner": "inner", "left": "left outer"}.get(how)
    if join_type is None:
        raise ValueError(
            f"broadcast_join supports how='inner'/'left' only (got {how!r}); "
            "right/full outer need hash_join"
        )
    if isinstance(small, Dataset):
        small = pa.concat_tables(
            small.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    if not isinstance(small, pa.Table):
        small = pa.Table.from_pandas(small, preserve_index=False)
    small = small.combine_chunks()
    on = [on] if isinstance(on, str) else list(on)
    right_on = (
        [right_on]
        if isinstance(right_on, str)
        else (list(right_on) if right_on else on)
    )
    ref = ray.put(small)

    def merge(batch: pa.Table) -> pa.Table:
        sm = _fetch_small(ref)
        return batch.join(
            sm, keys=on, right_keys=right_on, join_type=join_type
        )

    # Stateless tasks (not an actor pool): the broadcast side is fetched
    # from the object store per worker via _fetch_small's cache, and tasks
    # never starve the upstream read stage of CPUs.
    return big.map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)


def _key_set(keys_ds: Dataset, col: str) -> np.ndarray:
    parts = [
        b.column(col).to_numpy(zero_copy_only=False)
        for b in keys_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    return np.unique(np.concatenate(parts)) if parts else np.array([])


# Above this many distinct keys the broadcast membership set stops being
# "small" (every task holds a copy); degrade to a hash-shuffle semi/anti
# join instead.  HybridRDD applies the same small-side bound by
# construction (HybridRDD.scala:43-44).
SEMI_BROADCAST_LIMIT = int(os.environ.get("LKR_SEMI_BCAST_LIMIT", 5_000_000))


def _distinct_keys_ds(keys: Dataset, key_col: str, on: str) -> Dataset:
    from .shuffle import distinct

    k = distinct(keys.select_columns([key_col]), [key_col])
    if key_col != on:
        k = k.map_batches(
            lambda t: t.rename_columns([on]), batch_format="pyarrow"
        )
    return k


def semi_join(big: Dataset, keys, on: str, key_col: str | None = None) -> Dataset:
    """Keep rows of ``big`` whose ``on`` appears in ``keys``.

    Small key sets (≤ SEMI_BROADCAST_LIMIT) take the broadcast membership
    path (no shuffle of ``big``); larger sets degrade to a hash-shuffle
    inner join on the distinct keys."""
    key_col = key_col or on
    if isinstance(keys, Dataset):
        k = _distinct_keys_ds(keys, key_col, on)
        n = k.count()
        if n > SEMI_BROADCAST_LIMIT:
            from ..context import default_partitions

            return big.join(
                k, join_type="inner",
                num_partitions=default_partitions(n), on=(on,),
            )
        vals = _key_set(k, on)
    else:
        vals = np.asarray(keys)
    ref = ray.put(vals)

    def body(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        return t.filter(pc.is_in(t[on], value_set=pa.array(vs)))

    return big.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def anti_join(big: Dataset, keys, on: str, key_col: str | None = None) -> Dataset:
    key_col = key_col or on
    if isinstance(keys, Dataset):
        k = _distinct_keys_ds(keys, key_col, on)
        n = k.count()
        if n > SEMI_BROADCAST_LIMIT:
            from ..context import default_partitions

            k = k.map_batches(
                lambda t: t.append_column(
                    "_semi", pa.array(np.ones(t.num_rows, np.int8))
                ),
                batch_format="pyarrow",
            )
            j = big.join(
                k, join_type="left_outer",
                num_partitions=default_partitions(n), on=(on,),
            )
            j = j.map_batches(
                lambda t: t.filter(pc.is_null(t["_semi"])).drop_columns(["_semi"]),
                batch_format="pyarrow",
            )
            return j
        vals = _key_set(k, on)
    else:
        vals = np.asarray(keys)
    ref = ray.put(vals)

    def body(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        return t.filter(pc.invert(pc.is_in(t[on], value_set=pa.array(vs))))

    return big.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    right_cols: list[str],
    right_tie: str | None = None,
    prefix: str = "r_",
    num_partitions: int | None = None,
) -> Dataset:
    """Backward as-of join: for each left row, the right row with the
    greatest ``on`` ≤ left.``on`` within the same ``by`` key; LEFT
    semantics (no match → nulls).  A training-data-pipeline addition (no
    reference ancestor) — the temporal-lookup primitive behind
    "most recent prior event of kind X".

    Distributed shape: both sides are mapped onto one union schema with a
    side tag, hash-shuffled by ``by`` (keys block-complete, the one wide
    step), then each block runs a vectorized sweep — sort by (by, on,
    side[right first], tie), forward-max the right-row positions, validate
    the key, gather.  No per-key Python loop; cost is O(rows log rows) per
    block.

    ``right_tie`` pins equal-``on`` ties (largest value wins — mirrors SQL
    ``ORDER BY on DESC, tie DESC LIMIT 1``); omit it only when ties are
    impossible.  ``by``, ``on`` and ``right_tie`` must be numeric or
    timestamp (numpy-sortable).
    """
    from ..context import default_partitions
    from ..stages.shuffle import COALESCE_BATCH, hash_partition

    if num_partitions is None:
        num_partitions = default_partitions()
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = list(lschema.names)
    out_right = [prefix + c for c in right_cols]

    # the tie column rides the union as int64 (ints and timestamps cast
    # losslessly; left rows carry 0 — their tie value is never read)
    def widen_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"_by": t[by], "_on": t[on], "_side": pa.array(np.ones(n, np.int8)),
                "_tie": pa.array(np.zeros(n, np.int64))}
        for c in lcols:
            cols["l_" + c] = t[c]
        for c, oc in zip(right_cols, out_right):
            cols[oc] = pa.nulls(n, rschema.field(c).type)
        return pa.table(cols)

    def widen_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        tie = (
            pc.cast(t[right_tie], pa.int64())
            if right_tie
            else pa.array(np.zeros(n, np.int64))
        )
        cols = {"_by": t[by], "_on": t[on], "_side": pa.array(np.zeros(n, np.int8)),
                "_tie": tie}
        for c in lcols:
            cols["l_" + c] = pa.nulls(n, lschema.field(c).type)
        for c, oc in zip(right_cols, out_right):
            cols[oc] = t[c]
        return pa.table(cols)

    mb = dict(batch_format="pyarrow", batch_size=COALESCE_BATCH)
    u = left.map_batches(widen_left, **mb).union(right.map_batches(widen_right, **mb))
    part = hash_partition(u, ["_by"], num_partitions)

    def sweep(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(c, lschema.field(c).type) for c in lcols]
            + [(oc, rschema.field(c).type) for c, oc in zip(right_cols, out_right)]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        byv = t.column("_by").to_numpy(zero_copy_only=False)
        onv = t.column("_on").to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        tie = t.column("_tie").to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, side, onv, byv))
        sb, ss = byv[order], side[order]
        fwd = np.maximum.accumulate(np.where(ss == 0, np.arange(len(order)), -1))
        lpos = np.flatnonzero(ss == 1)
        match = fwd[lpos]
        valid = (match >= 0) & (sb[np.maximum(match, 0)] == sb[lpos])
        lidx = order[lpos]
        ridx = np.where(valid, order[np.maximum(match, 0)], 0)
        r_take = pa.array(ridx, pa.int64(), mask=~valid)
        cols = {}
        for c in lcols:
            cols[c] = t.column("l_" + c).take(pa.array(lidx, pa.int64()))
        for oc in out_right:
            cols[oc] = t.column(oc).take(r_take)
        return pa.table(cols, schema=out_schema)

    return part.map_batches(
        sweep, batch_format="pyarrow", zero_copy_batch=True, batch_size=COALESCE_BATCH
    )
