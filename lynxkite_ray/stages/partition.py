"""Skew handling: degree-threshold hub splitting + salted repartitioning —
the explicit Ray rebuild of the reference's HybridRDD (HybridRDD.scala:
1-59 design note, 73-237 impl; threshold = 200k/5 = 40k rows/key,
HybridRDD.scala:78-80; hub set bounded ≈ 5 × partition count by
construction, :43-44).

Two-path lookup exactly as the reference does it:
- **low-degree side**: hash-partitioned by key, joined co-partitioned
- **hub side**: rows stay evenly partitioned; the (small) per-hub payload
  is collected into a broadcast dict (``ray.put`` once) and looked up
  inside ``map_batches`` — no shuffle of the skewed rows, no hot partition

Hot-key salting for aggregates lives in ``shuffle.grouped_aggregate(...,
salt=N)``: partials fan out over N sub-reducers before the final per-key
combine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..context import HUB_DEGREE_THRESHOLD
from .shuffle import grouped_aggregate


def key_counts(ds: Dataset, key: str) -> Dataset:
    """(key, n) — exact per-key row counts (degree table).  The reference
    estimates this from sampled partitions (HybridRDD.scala:73-93); exact
    counts are one cheap pre-combined shuffle here and are reused as the
    degree artifact across operators."""
    ones = ds.select_columns([key]).map_batches(
        lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    return grouped_aggregate(ones, [key], [("one", "sum", "n")])


def hub_ids(ds: Dataset, key: str, threshold: int | None = None) -> np.ndarray:
    """Keys with more than ``threshold`` rows (sorted). Bounded small by
    construction: at most total_rows / threshold keys."""
    threshold = HUB_DEGREE_THRESHOLD if threshold is None else threshold
    counts = key_counts(ds, key)
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], threshold)).select([key]),
        batch_format="pyarrow",
    )
    vals = []
    for b in hot.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        vals.append(b[key].to_numpy())
    return np.sort(np.concatenate(vals)) if vals else np.empty(0, np.int64)


def split_by_hubs(ds: Dataset, key: str, hubs: np.ndarray) -> tuple[Dataset, Dataset]:
    """(low_degree_rows, hub_rows) — the HybridRDD two-path split."""
    ref = ray.put(hubs)

    def low(t: pa.Table) -> pa.Table:
        hs = pa.array(ray.get(ref))
        return t.filter(pc.invert(pc.is_in(t[key], value_set=hs)))

    def high(t: pa.Table) -> pa.Table:
        hs = pa.array(ray.get(ref))
        return t.filter(pc.is_in(t[key], value_set=hs))

    return (
        ds.map_batches(low, batch_format="pyarrow", zero_copy_batch=True),
        ds.map_batches(high, batch_format="pyarrow", zero_copy_batch=True),
    )


def broadcast_lookup(
    big: Dataset, small_map: dict, key: str, out: str, default=None
) -> Dataset:
    """smallTableLookup analog (HybridRDD.scala:95-100): map ``key`` through
    a broadcast sorted key/value array pair inside every block.  The dict is
    converted to sorted arrays ONCE on the driver; per batch the lookup is
    one ``np.searchsorted`` (int keys) or one ``pc.index_in`` + ``take``
    (strings) — no per-row Python loop in the hot path."""
    keys_arr = np.asarray(list(small_map.keys()))
    vals_arr = np.asarray(list(small_map.values()))
    order = np.argsort(keys_arr, kind="stable")
    keys_arr, vals_arr = keys_arr[order], vals_arr[order]
    numeric = np.issubdtype(keys_arr.dtype, np.number)
    ref = ray.put((keys_arr, vals_arr))

    def body(t: pa.Table) -> pa.Table:
        ks_sorted, vs_sorted = ray.get(ref)
        if numeric:
            k = t.column(key).to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ks_sorted, k), 0, max(len(ks_sorted) - 1, 0))
            hit = ks_sorted[pos] == k if len(ks_sorted) else np.zeros(len(k), bool)
            vals = vs_sorted[pos] if len(ks_sorted) else np.zeros(len(k), vs_sorted.dtype)
            if default is not None and not hit.all():
                vals = np.where(hit, vals, default)
                out_arr = pa.array(vals)
            else:
                out_arr = pa.array(vals, mask=~hit)
            return t.append_column(out, out_arr)
        # string keys: Arrow C++ hash lookup
        idx = pc.index_in(t.column(key), value_set=pa.array(ks_sorted))
        taken = pc.take(pa.array(vs_sorted), idx)  # misses → null
        if default is not None:
            taken = pc.fill_null(taken, default)
        return t.append_column(out, taken)

    return big.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


