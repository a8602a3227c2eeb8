"""Neo4j bulk export — the no-service analog of the reference's Neo4j
connector (ExportToNeo4j.scala:43-120, ExportGraphToNeo4j nodes +
relationships).  The reference streams a DataFrame into a LIVE Neo4j via
the Spark connector; no Neo4j service exists in this container, so the
export targets Neo4j's other official bulk path instead: the
``neo4j-admin database import`` CSV layout — one TYPED HEADER file plus
any number of headerless data part files per entity
(https://neo4j.com/docs/operations-manual/current/tools/neo4j-admin/neo4j-admin-import/).

That layout is exactly the distributed-friendly shape: each Ray block
writes its own headerless part CSV in parallel (no driver collection, no
single giant file), and the one-line header file is written driver-side.
A 100 TB graph exports as thousands of parts that neo4j-admin ingests
directly.

Semantics kept from the reference:
- rows with a null key are dropped before export
  (ExportAttributesToNeo4j.execute: "Drop null keys");
- nodes get ``:ID`` + ``:LABEL``, relationships ``:START_ID`` /
  ``:END_ID`` + ``:TYPE`` (ExportGraphToNeo4j.scala's VID/SRCID/DSTID
  columns);
- remaining columns become typed properties (int→long, float→double,
  bool→boolean, else string).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_NEO4J_TYPES = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_integer, "long"),
    (pa.types.is_floating, "double"),
]


def _prop_type(t: pa.DataType) -> str:
    for pred, name in _NEO4J_TYPES:
        if pred(t):
            return name
    return "string"


def _header(schema: pa.Schema, special: dict[str, str]) -> str:
    """neo4j-admin header line: ``name:type`` per property column, with the
    id/label/type columns spelled as their reserved fields."""
    cols = []
    for f in schema:
        if f.name in special:
            cols.append(special[f.name])
        else:
            cols.append(f"{f.name}:{_prop_type(f.type)}")
    return ",".join(cols)


def _write_parts(ds: Dataset, out_dir: str) -> None:
    from pyarrow import csv as pacsv

    ds.write_csv(
        out_dir,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(include_header=False)
        },
    )


def _drop_null_keys(ds: Dataset, keys: list[str]) -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        mask = None
        for k in keys:
            valid = pc.is_valid(t.column(k))
            mask = valid if mask is None else pc.and_(mask, valid)
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


def export_neo4j_nodes(
    ds: Dataset,
    path: str,
    id_col: str,
    label: str = "Vertex",
    id_space: str | None = None,
) -> dict:
    """Write ``<path>/nodes_header.csv`` + ``<path>/nodes/*.csv`` in
    neo4j-admin bulk-import layout.  ``id_space`` becomes the optional
    ID-space qualifier (``:ID(space)``)."""
    schema = ds.schema()
    arrow_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
    )
    idtag = f":ID({id_space})" if id_space else ":ID"
    header = _header(arrow_schema, {id_col: f"{id_col}{idtag}"}) + ",:LABEL"
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "nodes_header.csv"), "w") as f:
        f.write(header + "\n")

    def add_label(t: pa.Table) -> pa.Table:
        return t.append_column(":LABEL", pa.array([label] * len(t), pa.string()))

    out = _drop_null_keys(ds, [id_col]).map_batches(add_label, batch_format="pyarrow")
    _write_parts(out, os.path.join(path, "nodes"))
    return {
        "header": os.path.join(path, "nodes_header.csv"),
        "data_dir": os.path.join(path, "nodes"),
        "header_line": header,
        "label": label,
    }


def export_neo4j_relationships(
    ds: Dataset,
    path: str,
    src_col: str = "src",
    dst_col: str = "dst",
    rel_type: str = "EDGE",
    id_space: str | None = None,
) -> dict:
    """Write ``<path>/relationships_header.csv`` +
    ``<path>/relationships/*.csv`` (``:START_ID``/``:END_ID``/``:TYPE``)."""
    schema = ds.schema()
    arrow_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
    )
    sp = f"({id_space})" if id_space else ""
    header = (
        _header(
            arrow_schema,
            {src_col: f":START_ID{sp}", dst_col: f":END_ID{sp}"},
        )
        + ",:TYPE"
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "relationships_header.csv"), "w") as f:
        f.write(header + "\n")

    def add_type(t: pa.Table) -> pa.Table:
        return t.append_column(":TYPE", pa.array([rel_type] * len(t), pa.string()))

    out = _drop_null_keys(ds, [src_col, dst_col]).map_batches(
        add_type, batch_format="pyarrow"
    )
    _write_parts(out, os.path.join(path, "relationships"))
    return {
        "header": os.path.join(path, "relationships_header.csv"),
        "data_dir": os.path.join(path, "relationships"),
        "header_line": header,
        "type": rel_type,
    }


def export_neo4j_graph(
    vertices: Dataset,
    edges: Dataset,
    path: str,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    label: str = "Vertex",
    rel_type: str = "EDGE",
) -> dict:
    """Full-graph bulk export (ExportGraphToNeo4j analog): nodes +
    relationships under one root, plus the ready-to-run neo4j-admin
    command in the manifest."""
    n = export_neo4j_nodes(vertices, path, id_col, label)
    r = export_neo4j_relationships(edges, path, src_col, dst_col, rel_type)
    cmd = (
        "neo4j-admin database import full "
        f"--nodes={n['header']},{n['data_dir']}/.*\\.csv "
        f"--relationships={r['header']},{r['data_dir']}/.*\\.csv"
    )
    manifest = {"nodes": n, "relationships": r, "command": cmd}
    import json

    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
