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

# pyarrow group_by aggregate output suffix per function name
_SUFFIX = {
    "sum": "sum",
    "count": "count",
    "min": "min",
    "max": "max",
    "mean": "mean",
    "count_distinct": "count_distinct",
}


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
) -> Dataset:
    """groupby(keys) with C++ per-block aggregation after a key shuffle.

    aggs: list of (column, fn, out_name) with fn ∈ sum/count/min/max/mean/
    count_distinct. Exact for all listed fns (keys are block-complete).
    """
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
        # rename "<col>_<fn>" → out_name
        names = list(g.schema.names)
        rename = {f"{col}_{fn}": out for col, fn, out in aggs}
        g = g.rename_columns([rename.get(n, n) for n in names])
        return g

    return part.map_batches(
        agg_block,
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
