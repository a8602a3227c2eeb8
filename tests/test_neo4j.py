"""Neo4j bulk-export layout: typed headers, headerless parts, null-key drop."""

import csv
import glob
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from lynxkite_ray.sources.neo4j import export_neo4j_graph


def _read_parts(d):
    rows = []
    for p in sorted(glob.glob(os.path.join(d, "*.csv"))):
        with open(p) as f:
            rows.extend(r for r in csv.reader(f) if r)
    return rows


def test_export_neo4j_graph(tmp_path):
    verts = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, None], pa.int64()),
                "name": ["a", "b", "c", "dropme"],
                "score": pa.array([0.5, 1.5, 2.5, 3.5], pa.float64()),
            }
        )
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, None], pa.int64()),
                "dst": pa.array([2, 3, 1], pa.int64()),
                "weight": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
    )
    root = str(tmp_path / "neo")
    m = export_neo4j_graph(verts, edges, root, label="Page", rel_type="LINKS")

    assert m["nodes"]["header_line"] == "id:ID,name:string,score:double,:LABEL"
    assert (
        m["relationships"]["header_line"]
        == ":START_ID,:END_ID,weight:double,:TYPE"
    )
    with open(m["nodes"]["header"]) as f:
        assert f.read().strip() == m["nodes"]["header_line"]

    nrows = _read_parts(m["nodes"]["data_dir"])
    # null-id node dropped; every row carries the label; no header row
    assert sorted(r[0] for r in nrows) == ["1", "2", "3"]
    assert all(r[-1] == "Page" for r in nrows)
    assert all(r[0] != "id:ID" for r in nrows)

    erows = _read_parts(m["relationships"]["data_dir"])
    assert sorted((r[0], r[1]) for r in erows) == [("1", "2"), ("2", "3")]
    assert all(r[-1] == "LINKS" for r in erows)

    assert "neo4j-admin database import" in m["command"]
    assert os.path.exists(os.path.join(root, "manifest.json"))


def test_export_neo4j_many_blocks(tmp_path):
    n = 5000
    verts = rd.from_arrow(
        pa.table({"id": np.arange(n), "v": np.arange(n) * 2.0})
    ).repartition(8)
    root = str(tmp_path / "neo2")
    from lynxkite_ray.sources.neo4j import export_neo4j_nodes

    m = export_neo4j_nodes(verts, root, "id", label="V")
    rows = _read_parts(m["data_dir"])
    assert len(rows) == n
    assert sorted(int(r[0]) for r in rows) == list(range(n))
