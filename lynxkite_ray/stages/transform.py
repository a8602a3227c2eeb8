"""Per-record vectorized transforms — the AttributeFilters / Conversions /
Bucketing / AddConstant / HashVertexAttribute / AddRankingAttribute analog
layer (SURVEY §2.4, §2.8).  Everything is a zero-copy Arrow ``map_batches``
body; no Python row loops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def filter_batches(ds: Dataset, predicate) -> Dataset:
    """Vectorized filter: ``predicate(table) -> BooleanArray``
    (AttributeFilters.scala:23-64 analog; faster than row-wise ds.filter)."""
    return ds.map_batches(
        lambda t: t.filter(predicate(t)), batch_format="pyarrow", zero_copy_batch=True
    )


def add_constant(ds: Dataset, name: str, value) -> Dataset:
    """AddConstantAttribute.scala:67-85."""
    return ds.map_batches(
        lambda t: t.append_column(name, pa.array([value] * t.num_rows)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def add_computed(ds: Dataset, name: str, fn) -> Dataset:
    """Derive* analog: ``fn(table) -> Array`` appended as a new column."""
    return ds.map_batches(
        lambda t: t.append_column(name, fn(t)), batch_format="pyarrow", zero_copy_batch=True
    )


def convert_column(ds: Dataset, col: str, target: pa.DataType) -> Dataset:
    """Conversions.scala:127-238 — explicit type casts."""
    return ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index(col), col, pc.cast(t.column(col), target)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def hash_column(ds: Dataset, col: str, salt: str, out: str = "hash") -> Dataset:
    """HashVertexAttribute.scala:49 — salted SHA-256 (hex), matching DuckDB's
    ``sha256(salt || value)`` so the oracle can verify byte-for-byte."""

    def body(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        hexes = [
            hashlib.sha256((salt + ("" if v is None else str(v))).encode()).hexdigest()
            for v in vals
        ]
        return t.append_column(out, pa.array(hexes, type=pa.string()))

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def add_random(ds: Dataset, key_col: str, seed: int, out: str = "random") -> Dataset:
    """AddRandomAttribute analog, made deterministic under ANY partitioning:
    uniform [0,1) derived from blake2b(key, seed) rather than per-partition
    RNG state (the reference seeds per partition, RDDUtils.scala:345-357 —
    that breaks when the partitioning changes; content-keyed randomness
    doesn't)."""
    from ..ids import hash64_array

    def body(t: pa.Table) -> pa.Table:
        keys = [f"{seed}:{v}" for v in t.column(key_col).to_pylist()]
        h = hash64_array(keys)
        u = h.astype(np.float64) / float(1 << 63)
        return t.append_column(out, pa.array(u))

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def bucket_double(
    ds: Dataset, col: str, lo: float, hi: float, buckets: int, out: str = "bucket"
) -> Dataset:
    """Bucketing.scala:11-144 — fixed-width numeric bucketing; values at hi
    fall in the last bucket; outside range clamped."""
    width = (hi - lo) / buckets

    def body(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((v - lo) / width).astype(np.int64)
        np.clip(b, 0, buckets - 1, out=b)
        return t.append_column(out, pa.array(b))

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def ranking(ds: Dataset, cols: list[str], out: str = "rank", descending=False) -> Dataset:
    """AddRankingAttribute.scala:38 — dense global 1-based rank by
    (cols...) with the full column list as tie-break. Implemented as
    range-partitioned sort + positional zip with range(n): one count pass,
    one sort shuffle, no driver materialization."""
    import ray.data as rd

    n = ds.count()
    s = ds.sort(cols, descending=descending)
    z = s.zip(rd.range(n))

    def fin(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("id")
        r = pc.add(t.column("id"), 1)
        t = t.remove_column(idx)
        return t.append_column(out, r)

    return z.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)
