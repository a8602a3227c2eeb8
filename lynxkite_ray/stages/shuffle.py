"""Hash-shuffle primitives: key-partitioned repartition + per-block Arrow
aggregation.

Ray's ``groupby().aggregate()`` pays a per-key Python/actor cost that is
~30× slower than ``repartition(keys=...)`` (hash shuffle) followed by
pyarrow's C++ ``Table.group_by`` inside ``map_batches``.  After a key
repartition every key lives wholly in one block, so the per-block grouped
aggregate IS the global answer — the same invariant the reference gets
from its HashPartitioner + sortedRDD layout (SortedRDD.scala:370-380).

Use these for the hot wide ops (dedup, degree, message combine); Ray's
native aggregate stays for small results and custom AggregateFnV2s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..context import num_blocks_for

# Explicit batch_size for post-shuffle map_batches stages.  Two birds:
# (a) map_batches with the default batch_size=None SKIPS empty blocks and
# emits them schema-less, which poisons any later Dataset.join
# ("ArrowInvalid: no match for FieldRef on left side"); an explicit size
# makes the batcher coalesce away empty blocks.  (b) a value this large
# never SPLITS a block (only merges whole ones), so the "every key wholly
# inside one batch" invariant that post-shuffle grouped aggregation relies
# on is preserved.
COALESCE_BATCH = 1 << 40

# fns whose partial state is a single value per (key, block): the map-side
# pre-combine is exact (sum/count re-reduce with sum; min/max with
# themselves; mean decomposes into sum+count).  count_distinct has no
# scalar partial and takes the direct path.
_PRECOMBINABLE = {"sum", "count", "min", "max", "mean"}
# how a partial column re-reduces on the reduce side
_REDUCE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _sum_type(t: pa.DataType) -> pa.DataType:
    """pyarrow hash_sum's output promotion (float→float64, uint→uint64,
    signed→int64, decimal unchanged) — declared up front so empty blocks
    emit the same schema as aggregated ones."""
    if pa.types.is_floating(t):
        return pa.float64()
    if pa.types.is_decimal(t):
        return t
    if pa.types.is_unsigned_integer(t):
        return pa.uint64()
    return pa.int64()


def hash_partition(ds: Dataset, keys: list[str], num_partitions: int | None = None) -> Dataset:
    """Hash-partition by keys (requires DataContext.shuffle_strategy =
    HASH_SHUFFLE, set in context.configure)."""
    if num_partitions is None:
        from ..context import default_partitions

        num_partitions = default_partitions()
    return ds.repartition(num_partitions, keys=keys)


def grouped_aggregate(
    ds: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    num_partitions: int | None = None,
    salt: int = 0,
) -> Dataset:
    """groupby(keys) with C++ per-block aggregation after a key shuffle.

    aggs: list of (column, fn, out_name) with fn ∈ sum/count/min/max/mean/
    count_distinct. Exact for all listed fns (keys are block-complete).

    For sum/count/min/max/mean the aggregate runs MAP-SIDE first (one
    partial row per key per input block), so a hot key ships at most
    num_input_blocks tiny partial rows through the shuffle instead of its
    full row set — the reference's pre-shuffle combine (HybridRDD.scala:
    56-58).  ``salt > 1`` adds an intermediate combine over (keys, salt)
    so even those partials fan out over ``salt`` reducers before the final
    per-key combine — for extreme skew (one key in most input blocks of a
    100k-block corpus).  count_distinct has no scalar partial and takes
    the direct shuffle-then-aggregate path.
    """
    fns = {fn for _, fn, _ in aggs}
    if not fns <= _PRECOMBINABLE:
        part = hash_partition(ds, keys, num_partitions)

        def agg_block(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                fields = [(k, t.schema.field(k).type) for k in keys]
                for col, fn, out in aggs:
                    typ = pa.int64() if fn in ("count", "count_distinct") else (
                        pa.float64() if fn == "mean" else t.schema.field(col).type
                    )
                    fields.append((out, typ))
                return pa.table(
                    {name: pa.array([], type=typ) for name, typ in fields}
                )
            g = t.group_by(keys).aggregate([(col, fn) for col, fn, _ in aggs])
            names = list(g.schema.names)
            rename = {f"{col}_{fn}": out for col, fn, out in aggs}
            return g.rename_columns([rename.get(n, n) for n in names])

        return part.map_batches(
            agg_block,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COALESCE_BATCH,
        )

    # --- pre-combined path ---
    # unique (col, partial_fn) pairs; one partial column "__p{i}" each
    pairs: list[tuple[str, str]] = []

    def _pair(col: str, fn: str) -> int:
        if (col, fn) not in pairs:
            pairs.append((col, fn))
        return pairs.index((col, fn))

    # per output column: (out_name, fn, pair index | (sum_idx, count_idx))
    plan: list[tuple[str, str, object]] = []
    for col, fn, out in aggs:
        if fn == "mean":
            plan.append((out, "mean", (_pair(col, "sum"), _pair(col, "count"))))
        else:
            plan.append((out, fn, _pair(col, fn)))

    p_names = [f"__p{i}" for i in range(len(pairs))]

    def _partial_type(schema: pa.Schema, col: str, fn: str) -> pa.DataType:
        # canonical partial types, deterministic from the INPUT schema (the
        # same for every block), so empty and aggregated blocks agree
        if fn == "count":
            return pa.int64()
        if fn == "sum":
            return _sum_type(schema.field(col).type)
        return schema.field(col).type  # min / max

    def partial_block(t: pa.Table) -> pa.Table:
        p_types = [_partial_type(t.schema, col, fn) for col, fn in pairs]
        if t.num_rows == 0:
            cols = {k: pa.array([], type=t.schema.field(k).type) for k in keys}
            cols.update(
                {n: pa.array([], type=typ) for n, typ in zip(p_names, p_types)}
            )
            return pa.table(cols)
        g = t.group_by(keys).aggregate(list(pairs))
        cols = {k: g.column(k) for k in keys}
        for (col, fn), name, typ in zip(pairs, p_names, p_types):
            cols[name] = g.column(f"{col}_{fn}").cast(typ)
        return pa.table(cols)

    def combine_partials(t: pa.Table, group_cols: list[str]) -> pa.Table:
        """Re-reduce partial columns; canonical partial types are closed
        under their reduce fns (sum int64→int64 etc.), so no re-cast."""
        g = t.group_by(group_cols).aggregate(
            [(n, _REDUCE_FN[fn]) for n, (_, fn) in zip(p_names, pairs)]
        )
        cols = {k: g.column(k) for k in group_cols}
        for n, (_, fn) in zip(p_names, pairs):
            cols[n] = g.column(f"{n}_{_REDUCE_FN[fn]}")
        return pa.table(cols)

    def final_block(t: pa.Table) -> pa.Table:
        # t carries the partial schema (keys + __p columns) even when empty
        if t.num_rows == 0:
            cols = {k: pa.array([], type=t.schema.field(k).type) for k in keys}
            for out, fn, ref in plan:
                typ = (
                    pa.float64()
                    if fn == "mean"
                    else t.schema.field(p_names[ref]).type
                )
                cols[out] = pa.array([], type=typ)
            return pa.table(cols)
        g = combine_partials(t, keys)
        cols = {k: g.column(k) for k in keys}
        for out, fn, ref in plan:
            if fn == "mean":
                s_idx, c_idx = ref
                cols[out] = pc.divide(
                    g.column(p_names[s_idx]).cast(pa.float64()),
                    g.column(p_names[c_idx]),
                )
            else:
                cols[out] = g.column(p_names[ref])
        return pa.table(cols)

    pre = ds.map_batches(
        partial_block, batch_format="pyarrow", zero_copy_batch=True
    )
    if salt > 1:
        # spread each key's partials over `salt` reducers first; the salt
        # value is a deterministic function of row position only — partials
        # re-combine exactly regardless of which sub-reducer they land on
        def add_salt(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("__salt", pa.array([], type=pa.int64()))
            s = (np.arange(t.num_rows, dtype=np.int64) * 2654435761) % salt
            return t.append_column("__salt", pa.array(s))

        salted = pre.map_batches(
            add_salt, batch_format="pyarrow", zero_copy_batch=True
        )
        mid = hash_partition(salted, keys + ["__salt"], num_partitions).map_batches(
            lambda t: combine_partials(t, keys + ["__salt"]).drop_columns("__salt"),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=COALESCE_BATCH,
        )
        pre = mid
    return hash_partition(pre, keys, num_partitions).map_batches(
        final_block,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COALESCE_BATCH,
    )


def distinct(ds: Dataset, keys: list[str], num_partitions: int | None = None) -> Dataset:
    """Exact distinct rows over ``keys`` (projection included): per-block
    pre-dedup → key shuffle → per-block dedup."""

    def local_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(keys)
        cols = [t.column(k).to_numpy(zero_copy_only=False) for k in keys]
        order = np.lexsort(tuple(reversed(cols)))
        sorted_cols = [c[order] for c in cols]
        keep = np.zeros(t.num_rows, dtype=bool)
        keep[0] = True
        for c in sorted_cols:
            keep[1:] |= c[1:] != c[:-1]
        return pa.table({k: c[keep] for k, c in zip(keys, sorted_cols)})

    pre = ds.select_columns(keys).map_batches(
        local_dedup, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_partition(pre, keys, num_partitions).map_batches(
        local_dedup,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=COALESCE_BATCH,
    )
