"""LookupRegion — point-in-region attribute lookup (LookupRegion.scala:
46-90): each (lat, lon) point gets the attribute of the FIRST region (in
region order) whose bounding box and geometry contain it; unmatched points
are dropped (the reference's flatMapValues(Option) semantics).

The reference loads a shapefile via GeoTools and runs a driver-serialized
(bbox, geometry, attr) vector against every point.  No geo stack exists in
this container, so regions are plain data — (name, rings) with each ring a
float (k, 2) array of (lon, lat) vertices; shapefile parsing is the one
absent piece (plug a loader in front; the lookup below is format-independent).

Ray shape (the reference's canonical stateful-stage pattern): the region
table is ``ray.put`` ONCE; each actor deserializes and precomputes bboxes
in ``__init__``; per batch the even-odd ray-casting test runs fully
vectorized in numpy (points × ring edges), bbox prefilter first, regions
checked in order with already-matched points masked out — no per-point
Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def _ring_array(ring) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if r.ndim != 2 or r.shape[1] != 2 or len(r) < 3:
        raise ValueError("ring must be (k>=3, 2) of (lon, lat)")
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[0]])  # close the ring
    return r


def _pip_even_odd(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Vectorized even-odd (ray casting) containment for n points against a
    polygon given as rings (holes included naturally by the parity rule)."""
    inside = np.zeros(len(px), dtype=bool)
    for r in rings:
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        crosses = (y0 > py[:, None]) != (y1 > py[:, None])
        dy = np.where(y1 != y0, y1 - y0, 1.0)
        xint = x0 + (py[:, None] - y0) * (x1 - x0) / dy
        inside ^= np.logical_xor.reduce(crosses & (px[:, None] < xint), axis=1)
    return inside


class RegionLookup:
    """Actor-pool stage: (lat, lon) batch → + region attribute column.
    Regions deserialized + bboxes precomputed once per actor (the
    reference's per-executor shapefile vector, LookupRegion.scala:56-65)."""

    def __init__(self, regions_ref, lat_col, lon_col, out, keep_unmatched):
        regions = ray.get(regions_ref)
        self.names: list[str] = []
        self.rings: list[list[np.ndarray]] = []
        self.bboxes: list[tuple[float, float, float, float]] = []
        for name, rings in regions:
            rr = [_ring_array(r) for r in (rings if isinstance(rings, list) else [rings])]
            allv = np.vstack(rr)
            self.names.append(str(name))
            self.rings.append(rr)
            self.bboxes.append(
                (allv[:, 0].min(), allv[:, 0].max(), allv[:, 1].min(), allv[:, 1].max())
            )
        self.lat_col, self.lon_col = lat_col, lon_col
        self.out = out
        self.keep_unmatched = keep_unmatched

    def __call__(self, t: pa.Table) -> pa.Table:
        lat = t.column(self.lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t.column(self.lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(lat)
        hit = np.full(n, -1, dtype=np.int64)
        open_ = np.ones(n, dtype=bool)  # not yet matched (first-match wins)
        for ri, (x0, x1, y0, y1) in enumerate(self.bboxes):
            cand = open_ & (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
            if not cand.any():
                continue
            idx = np.flatnonzero(cand)
            inside = _pip_even_odd(lon[idx], lat[idx], self.rings[ri])
            matched = idx[inside]
            hit[matched] = ri
            open_[matched] = False
        names = np.asarray(self.names + [""], dtype=object)
        vals = pa.array(names[hit].tolist(), pa.string())
        out = t.append_column(self.out, vals)
        if self.keep_unmatched:
            return out
        return out.filter(pa.array(hit >= 0))


def lookup_region(
    points: Dataset,
    regions,
    lat_col: str = "lat",
    lon_col: str = "lon",
    out: str = "region",
    keep_unmatched: bool = False,
    concurrency=None,
) -> Dataset:
    """regions: ordered list of (name, ring | [rings]) with rings as
    (k, 2) arrays of (lon, lat).  First containing region wins; unmatched
    points are dropped unless ``keep_unmatched`` (then region="")."""
    ref = ray.put(list(regions))
    kwargs = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_constructor_args=(ref, lat_col, lon_col, out, keep_unmatched),
    )
    if concurrency is None:
        from ..context import pool_size

        concurrency = pool_size()
    return points.map_batches(RegionLookup, concurrency=concurrency, **kwargs)


def _seg_dist2(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Min squared distance from n points to any polygon BOUNDARY segment
    (vectorized points × edges)."""
    best = np.full(len(px), np.inf)
    for r in rings:
        ax, ay = r[:-1, 0], r[:-1, 1]
        bx, by = r[1:, 0], r[1:, 1]
        dx, dy = bx - ax, by - ay
        ll = dx * dx + dy * dy
        ll = np.where(ll > 0, ll, 1.0)
        t = ((px[:, None] - ax) * dx + (py[:, None] - ay) * dy) / ll
        t = np.clip(t, 0.0, 1.0)
        cx = ax + t * dx
        cy = ay + t * dy
        d2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
        best = np.minimum(best, d2.min(axis=1))
    return best


class ProximitySegmenter:
    """Actor-pool stage for 'Segment by geographical proximity'
    (BuildSegmentationOperations.scala:563, SegmentByGeographicalProximity):
    each point emits ONE ROW PER region it lies inside or within
    ``distance`` of (the belongsTo multi-link, unlike RegionLookup's
    first-match single attribute).  Shapefile parsing stays out (no geo
    stack in the container); regions are the same plain (name, rings) data
    LookupRegion takes."""

    def __init__(self, regions_ref, distance, lat_col, lon_col, out):
        regions = ray.get(regions_ref)
        self.names: list[str] = []
        self.rings: list[list[np.ndarray]] = []
        self.bboxes: list[tuple[float, float, float, float]] = []
        for name, rings in regions:
            rr = [_ring_array(r) for r in (rings if isinstance(rings, list) else [rings])]
            allv = np.vstack(rr)
            self.names.append(str(name))
            self.rings.append(rr)
            self.bboxes.append(
                (allv[:, 0].min(), allv[:, 0].max(), allv[:, 1].min(), allv[:, 1].max())
            )
        self.distance = float(distance)
        self.lat_col, self.lon_col = lat_col, lon_col
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        lat = t.column(self.lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t.column(self.lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        d = self.distance
        ids_out, seg_out = [], []
        base = t.column("id").to_numpy(zero_copy_only=False)
        for ri, (x0, x1, y0, y1) in enumerate(self.bboxes):
            # bbox prefilter widened by the buffer
            cand = (
                (lon >= x0 - d) & (lon <= x1 + d) & (lat >= y0 - d) & (lat <= y1 + d)
            )
            if not cand.any():
                continue
            idx = np.flatnonzero(cand)
            inside = _pip_even_odd(lon[idx], lat[idx], self.rings[ri])
            near = inside
            if d > 0:
                d2 = _seg_dist2(lon[idx], lat[idx], self.rings[ri])
                near = inside | (d2 <= d * d)
            m = idx[near]
            if len(m):
                ids_out.append(base[m])
                seg_out.append(np.full(len(m), self.names[ri], dtype=object))
        if not ids_out:
            return pa.table(
                {"id": pa.array([], pa.int64()), self.out: pa.array([], pa.string())}
            )
        return pa.table(
            {
                "id": np.concatenate(ids_out),
                self.out: pa.array(np.concatenate(seg_out).tolist(), pa.string()),
            }
        )


def segment_by_proximity(
    points: Dataset,
    regions,
    distance: float = 0.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    out: str = "segment",
    concurrency=None,
) -> Dataset:
    """(id, segment) belongsTo pairs: one row per (point, region) with the
    point inside the region or within ``distance`` of its boundary."""
    ref = ray.put(list(regions))
    if concurrency is None:
        from ..context import pool_size

        concurrency = pool_size()
    return points.map_batches(
        ProximitySegmenter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_args=(ref, distance, lat_col, lon_col, out),
    )
