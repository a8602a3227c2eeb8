"""LookupRegion: even-odd containment kernel + first-match semantics."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from lynxkite_ray.functions.geo import _pip_even_odd, _ring_array, lookup_region


def test_pip_concave_polygon():
    # concave "L" shape: (0,0)-(4,0)-(4,1)-(1,1)-(1,4)-(0,4)
    ring = _ring_array([(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4)])
    px = np.array([0.5, 2.0, 2.0, 0.5, 3.9, 1.5])
    py = np.array([0.5, 0.5, 2.0, 3.5, 0.9, 1.5])
    want = np.array([True, True, False, True, True, False])
    np.testing.assert_array_equal(_pip_even_odd(px, py, [ring]), want)


def test_pip_polygon_with_hole():
    outer = _ring_array([(0, 0), (10, 0), (10, 10), (0, 10)])
    hole = _ring_array([(3, 3), (7, 3), (7, 7), (3, 7)])
    px = np.array([1.0, 5.0, 8.0, 3.5])
    py = np.array([1.0, 5.0, 8.0, 6.5])
    want = np.array([True, False, True, False])  # hole punched out
    np.testing.assert_array_equal(_pip_even_odd(px, py, [outer, hole]), want)


def test_lookup_region_first_match_and_drop():
    pts = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "lat": pa.array([0.5, 0.5, -50.0, 200.0], pa.float64()),
                "lon": pa.array([0.5, 40.0, -50.0, 200.0], pa.float64()),
            }
        )
    )
    d = 30.25
    regions = [
        ("diamond", np.array([(d, 0.0), (0.0, d), (-d, 0.0), (0.0, -d)])),
        ("ne", np.array([(0.0, 0.0), (100.0, 0.0), (100.0, 100.0), (0.0, 100.0)])),
        ("sw", np.array([(-100.0, -100.0), (0.0, -100.0), (0.0, 0.0), (-100.0, 0.0)])),
    ]
    got = {r["id"]: r["region"] for r in lookup_region(pts, regions, concurrency=1).take_all()}
    # id=1 is inside BOTH diamond and ne: diamond listed first wins
    assert got == {1: "diamond", 2: "ne", 3: "sw"}  # id=4 unmatched: dropped

    kept = {
        r["id"]: r["region"]
        for r in lookup_region(pts, regions, keep_unmatched=True, concurrency=1).take_all()
    }
    assert kept[4] == ""


def test_segment_by_proximity_buffer_and_multimatch():
    """'Segment by geographical proximity' (BuildSegmentationOperations.
    scala:563): inside → match, within d of the boundary → match, gap
    points match BOTH adjacent regions, far points match none."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lynxkite_ray.functions.geo import segment_by_proximity

    left = ("left", np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]))
    right = ("right", np.array([(12.0, 0.0), (22.0, 0.0), (22.0, 10.0), (12.0, 10.0)]))
    pts = rd.from_arrow(
        pa.table(
            {
                "id": [1, 2, 3, 4],
                "lon": [5.0, 11.0, 30.0, 12.5],
                "lat": [5.0, 5.0, 5.0, 5.0],
            }
        )
    )
    out = sorted(
        (r["id"], r["segment"])
        for r in segment_by_proximity(pts, [left, right], distance=1.5).take_all()
    )
    # 1: inside left; 2: in the gap, within 1.5 of BOTH; 3: far from all;
    # 4: inside right
    assert out == [(1, "left"), (2, "left"), (2, "right"), (4, "right")]
