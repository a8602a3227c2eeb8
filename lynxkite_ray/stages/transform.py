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


def bucket_double_log(
    ds: Dataset, col: str, lo: float, hi: float, buckets: int, out: str = "bucket"
) -> Dataset:
    """Logarithmic bucketing (the FE histogram's log axis,
    Bucketer.scala logarithmic mode): bucket edges geometric between lo
    and hi (both > 0); values outside clamp to the edge buckets, rows
    ≤ 0 are dropped (undefined on a log axis)."""
    import math

    la, lb = math.log(lo), math.log(hi)
    scale = buckets / (lb - la)

    def body(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        keep = v > 0
        tt = t.filter(pa.array(keep))
        b = np.floor((np.log(v[keep]) - la) * scale).astype(np.int64)
        np.clip(b, 0, buckets - 1, out=b)
        return tt.append_column(out, pa.array(b))

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def string_bucketing(ds: Dataset, col: str, id_col: str = "id") -> Dataset:
    """StringBucketing (Bucketing.scala:33-63): one segment per distinct
    attribute value; each row of the output is a belongsTo edge
    (id, segment, label).  Segment ids are content hashes of the label
    (ids.py join-free philosophy) instead of randomNumbered."""
    from ..ids import hash64_array

    def body(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        return pa.table(
            {
                id_col: t.column(id_col),
                "segment": hash64_array(vals),
                "label": pa.array(vals, pa.string()),
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        body, batch_format="pyarrow", zero_copy_batch=True
    )


def double_bucketing(
    ds: Dataset,
    col: str,
    bucket_width: float,
    overlap: bool = False,
    id_col: str = "id",
) -> Dataset:
    """DoubleBucketing (Bucketing.scala:86-117): bucket = floor(value/step)
    with step = width/2 when overlapping (each vertex then belongs to 2
    segments: bucket−1 and bucket); segment [bottom, top] attributes
    attached to every belongsTo row."""
    step = bucket_width / 2 if overlap else bucket_width

    def body(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / step).astype(np.int64)
        if overlap:
            ids = np.repeat(ids, 2)
            b = np.stack([b - 1, b], axis=1).reshape(-1)
        return pa.table(
            {
                id_col: ids,
                "bucket": b,
                "bottom": b * step,
                "top": b * step + bucket_width,
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        body, batch_format="pyarrow", zero_copy_batch=True
    )


def interval_bucketing(
    ds: Dataset,
    begin_col: str,
    end_col: str,
    bucket_width: float,
    overlap: bool = False,
    id_col: str = "id",
) -> Dataset:
    """IntervalBucketing (Bucketing.scala:145-177): a vertex spans
    [begin, end]; it belongs to every bucket its interval intersects
    (floor(begin/step) … floor(end/step), one earlier when overlapping).
    Vectorized expansion: per-row bucket counts → repeat + offset ramp."""
    step = bucket_width / 2 if overlap else bucket_width

    def body(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy()
        b0 = np.floor(
            t.column(begin_col).to_numpy(zero_copy_only=False).astype(np.float64) / step
        ).astype(np.int64)
        b1 = np.floor(
            t.column(end_col).to_numpy(zero_copy_only=False).astype(np.float64) / step
        ).astype(np.int64)
        if overlap:
            b0 = b0 - 1
        counts = np.maximum(b1 - b0 + 1, 0)
        rep_ids = np.repeat(ids, counts)
        starts = np.repeat(b0, counts)
        total = int(counts.sum())
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        ramp = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        b = starts + ramp
        return pa.table(
            {
                id_col: rep_ids,
                "bucket": b,
                "bottom": b * step,
                "top": b * step + bucket_width,
            }
        )

    return ds.select_columns([id_col, begin_col, end_col]).map_batches(
        body, batch_format="pyarrow", zero_copy_batch=True
    )


def vertex_bucket_grid(
    ds: Dataset,
    xcol: str,
    ycol: str,
    xlo: float,
    xhi: float,
    xbuckets: int,
    ylo: float,
    yhi: float,
    ybuckets: int,
) -> Dataset:
    """VertexBucketGrid.scala:33-80 — 2-D fixed-width bucket counts for
    the bucketed-view grid: per-block (xb, yb) histogram partials summed
    by one tiny grouped aggregate (the combine is xbuckets×ybuckets, not
    O(rows))."""
    from ray.data.aggregate import Sum

    xw = (xhi - xlo) / xbuckets
    yw = (yhi - ylo) / ybuckets

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(xcol).to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column(ycol).to_numpy(zero_copy_only=False).astype(np.float64)
        xb = np.clip(np.floor((x - xlo) / xw).astype(np.int64), 0, xbuckets - 1)
        yb = np.clip(np.floor((y - ylo) / yw).astype(np.int64), 0, ybuckets - 1)
        key = xb * ybuckets + yb
        cnt = np.bincount(key, minlength=xbuckets * ybuckets)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "xb": nz // ybuckets,
                "yb": nz % ybuckets,
                "n": cnt[nz],
            }
        )

    return (
        ds.select_columns([xcol, ycol])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["xb", "yb"])
        .aggregate(Sum("n", alias_name="n"))
    )


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



def json_fields(
    ds: Dataset,
    col: str,
    fields: dict[str, "pa.DataType"],
    keep: list[str] | None = None,
) -> Dataset:
    """Extract scalar fields from a JSON string column (the metadata-blob
    parse step of web-corpus pipelines; the reference covers this through
    DerivePython, DerivePython.scala:27-74).

    ``fields``: {key: arrow type} for flat scalar keys; missing keys and
    unparseable rows yield null.  One C-level ``json.loads`` per row —
    the parse IS the compute here (same cost class as the per-document
    tokenizers in functions/text.py); the typed column build is Arrow."""
    import json

    keys = list(fields)

    def body(t: pa.Table) -> pa.Table:
        raw = t.column(col).to_pylist()
        cols: dict[str, list] = {k: [] for k in keys}
        for s in raw:
            try:
                d = json.loads(s) if s is not None else {}
            except ValueError:
                d = {}
            if not isinstance(d, dict):
                d = {}
            for k in keys:
                v = d.get(k)
                cols[k].append(v if not isinstance(v, (dict, list)) else None)
        base = {
            c: t.column(c) for c in (keep if keep is not None else t.column_names)
        }
        for k in keys:
            typ = fields[k]
            if pa.types.is_integer(typ) or pa.types.is_floating(typ):
                vals = [
                    float(v)
                    if isinstance(v, (int, float)) and not isinstance(v, bool)
                    else None
                    for v in cols[k]
                ]
                base[k] = pc.cast(pa.array(vals, pa.float64()), typ)
            elif pa.types.is_boolean(typ):
                base[k] = pa.array(
                    [v if isinstance(v, bool) else None for v in cols[k]], typ
                )
            else:
                base[k] = pa.array(
                    [None if v is None else str(v) for v in cols[k]], typ
                )
        return pa.table(base)

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def explode(
    ds: Dataset,
    list_col: str,
    value_out: str = "value",
    pos_col: str | None = "pos",
    keep: list[str] | None = None,
) -> Dataset:
    """List column → one row per element (the SQL UNNEST / Spark explode
    analog; inverse of the AsVector aggregator).  Null / empty lists
    produce no rows.  Pure Arrow offset math per batch: lengths from the
    ListArray offsets, parent-row gather via one ``take``, element
    positions from a cumulative-start subtraction — no per-row Python."""

    def body(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # null lists → length 0 (value_lengths yields null there)
        lens = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        starts = np.cumsum(lens) - lens
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
        # gather the flat element values: flatten() drops null lists'
        # (nonexistent) slots, matching the lens accounting above
        values = arr.flatten()
        cols = {}
        parent_idx = pa.array(parent, pa.int64())
        for c in keep if keep is not None else [n for n in t.column_names if n != list_col]:
            cols[c] = t.column(c).take(parent_idx)
        if pos_col:
            cols[pos_col] = pa.array(pos, pa.int64())
        cols[value_out] = values
        return pa.table(cols)

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


def unpivot(
    ds: Dataset,
    id_cols: list[str],
    value_cols: list[str],
    name_col: str = "metric",
    value_col: str = "val",
    value_type: "pa.DataType | None" = None,
) -> Dataset:
    """Wide → long (SQL UNPIVOT / pandas melt; inverse of the pivot
    indicator-column pattern): each row fans out to one row per value
    column, tagged with the source column name.  Per batch this is K
    zero-copy column projections concatenated — no row loop; output rows
    = input × K, re-blocked by the streaming executor downstream."""
    vt = value_type or pa.float64()

    def body(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {ic: t.column(ic) for ic in id_cols}
            cols[name_col] = pa.array([c] * t.num_rows, pa.string())
            cols[value_col] = pc.cast(t.column(c), vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)
