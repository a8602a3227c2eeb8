"""Co-purchase part graph derived from the driver's TPC-H-ish tables.

Edges = unordered pairs of distinct parts appearing in the same order
(canonical src < dst, deduplicated across orders).  This is the
SQL-mirrorable graph the DuckDB correctness oracle checks graph operators
against (the pages graph can't be expressed in SQL over the registered
views; this one can):

    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey

Built Ray-Data-first: a hash-partitioned self-``join`` of lineitem on
l_orderkey (vectorized, no per-group Python), filter src < dst, then the
standard (src, dst) dedup shuffle.  VerticesToEdges analog: the vertex set
is all parts of the `part` table, so parts never co-purchased are isolated
vertices (PageRank dangling mass, CC singletons).

Materialized edge Datasets and Graph handles are cached per sf_dir within
the Ray session so the driver's repeated ``queries()`` calls don't rebuild
the pipeline each time (the reference caches entities by GUID the same way,
DataManager.scala:181-197).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.edges import add_reversed_edges, links_to_edges

_EDGE_CACHE: dict = {}
_GRAPH_CACHE: dict = {}


def copurchase_edges(sf_dir: str, num_partitions: int | None = None):
    """Canonical (src < dst) deduplicated co-purchase edge Dataset
    (materialized + cached per sf_dir)."""
    if sf_dir in _EDGE_CACHE:
        return _EDGE_CACHE[sf_dir]
    import pyarrow.parquet as pq

    from ..context import num_blocks_for

    path = f"{sf_dir}/lineitem.parquet"
    n_rows = pq.read_metadata(path).num_rows
    nb = num_blocks_for(n_rows)
    # join-partition count scales with data; small inputs stay at few
    # partitions — per-partition aggregator overhead dominates otherwise
    npart = num_partitions or max(2, 2 * nb)
    li = rd.read_parquet(
        path, columns=["l_orderkey", "l_partkey"], override_num_blocks=nb
    )
    a = li.map_batches(
        lambda t: t.rename_columns(["k", "src"]), batch_format="pyarrow"
    )
    b = li.map_batches(
        lambda t: t.rename_columns(["k", "dst"]), batch_format="pyarrow"
    )
    pairs = a.join(b, join_type="inner", num_partitions=npart, on=("k",))
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])).select(["src", "dst"]),
        batch_format="pyarrow",
    )
    edges = links_to_edges(pairs).materialize()
    _EDGE_CACHE[sf_dir] = edges
    return edges


def copurchase_symmetric(sf_dir: str):
    """Both-direction view for the undirected algorithms (PR over symmetric
    edges; the canonical view already suffices for CC/LPA/triangles, which
    treat edges as undirected internally)."""
    key = (sf_dir, "sym")
    if key not in _EDGE_CACHE:
        _EDGE_CACHE[key] = add_reversed_edges(copurchase_edges(sf_dir)).materialize()
    return _EDGE_CACHE[key]


def part_vertices(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    return np.sort(t.column("p_partkey").to_numpy())


def copurchase_graph(sf_dir: str, symmetric: bool):
    """Cached Graph handle over the co-purchase edges + all part vertices."""
    from ..functions.graph import Graph

    key = (sf_dir, symmetric)
    if key not in _GRAPH_CACHE:
        edges = copurchase_symmetric(sf_dir) if symmetric else copurchase_edges(sf_dir)
        _GRAPH_CACHE[key] = Graph.from_edges(edges, extra_vertices=part_vertices(sf_dir))
    return _GRAPH_CACHE[key]
