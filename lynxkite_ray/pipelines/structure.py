"""Structure-transform query battery: directed precedence graph (parts
ordered by line number within an order), induced subgraphs, attribute-match
edges, row splitting, clustering coefficient, shortest paths — each with an
exact DuckDB oracle.

The precedence graph is the SQL-mirrorable *directed* graph (the
co-purchase graph is symmetric by construction, which would make the
symmetry operators trivial):

    src = l_partkey of line k, dst = l_partkey of line k+1 (same order)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.edges import (
    distinct,
    edge_multiplicity,
    edges_from_matches,
    induced_subgraph,
    remove_non_symmetric,
    reverse_edges,
)
from ..util import round_away

_PREC_CACHE: dict = {}

PREC_CTE = """
prec AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey
   AND b.l_linenumber = a.l_linenumber + 1
   AND a.l_partkey != b.l_partkey
)
"""


def precedence_pairs(sf_dir: str):
    """Raw (non-distinct) directed part-precedence pairs."""
    import pyarrow.parquet as pq

    from ..context import num_blocks_for

    path = f"{sf_dir}/lineitem.parquet"
    nb = num_blocks_for(pq.read_metadata(path).num_rows)
    li = rd.read_parquet(
        path, columns=["l_orderkey", "l_linenumber", "l_partkey"], override_num_blocks=nb
    )
    a = li.map_batches(
        lambda t: pa.table(
            {"k": t["l_orderkey"], "pos": t["l_linenumber"], "src": t["l_partkey"]}
        ),
        batch_format="pyarrow",
    )
    b = li.map_batches(
        lambda t: pa.table(
            {
                "k": t["l_orderkey"],
                "pos": pc.cast(pc.subtract(t["l_linenumber"], 1), pa.int32()),
                "dst": t["l_partkey"],
            }
        ),
        batch_format="pyarrow",
    )
    j = a.join(b, join_type="inner", num_partitions=8, on=("k", "pos"))
    return j.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])).select(["src", "dst"]),
        batch_format="pyarrow",
    )


def precedence_edges(sf_dir: str):
    if sf_dir not in _PREC_CACHE:
        _PREC_CACHE[sf_dir] = distinct(
            precedence_pairs(sf_dir), ["src", "dst"]
        ).materialize()
    return _PREC_CACHE[sf_dir]


def q_precedence_edges(sf_dir: str):
    return precedence_edges(sf_dir)


PRECEDENCE_SQL = "WITH " + PREC_CTE.strip() + "\nSELECT src, dst FROM prec"


def q_precedence_multiplicity(sf_dir: str):
    return edge_multiplicity(precedence_pairs(sf_dir))


PREC_MULT_SQL = """
SELECT a.l_partkey AS src, b.l_partkey AS dst, COUNT(*) AS multiplicity
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey
 AND b.l_linenumber = a.l_linenumber + 1
 AND a.l_partkey != b.l_partkey
GROUP BY 1, 2
"""


def q_precedence_reversed(sf_dir: str):
    return reverse_edges(precedence_edges(sf_dir))


PREC_REV_SQL = "WITH " + PREC_CTE.strip() + "\nSELECT dst AS src, src AS dst FROM prec"


def q_remove_non_symmetric(sf_dir: str):
    return remove_non_symmetric(precedence_edges(sf_dir))


REMOVE_NONSYM_SQL = (
    "WITH "
    + PREC_CTE.strip()
    + """
SELECT e.src, e.dst FROM prec e JOIN prec r ON r.src = e.dst AND r.dst = e.src
"""
)


def q_induced_subgraph(sf_dir: str):
    import pyarrow.parquet as pq

    from .copurchase import copurchase_edges

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"])
    big = part.filter(pc.greater(part["p_size"], 25)).column("p_partkey").to_numpy()
    return induced_subgraph(copurchase_edges(sf_dir), big)


INDUCED_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
big AS (SELECT p_partkey FROM part WHERE p_size > 25)
SELECT src, dst FROM edges
WHERE src IN (SELECT p_partkey FROM big) AND dst IN (SELECT p_partkey FROM big)
"""


def q_nation_region_matches(sf_dir: str):
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    nat = nat.map_batches(
        lambda t: pa.table(
            {
                "key": pc.cast(t["n_regionkey"], pa.int64()),
                "id": pc.cast(t["n_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return edges_from_matches(nat, "key", "id")


NATION_MATCH_SQL = """
SELECT CAST(a.n_nationkey AS BIGINT) AS src, CAST(b.n_nationkey AS BIGINT) AS dst
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
"""


def q_split_rows(sf_dir: str):
    """SplitVertices.scala:27 — duplicate each row by a repetition count
    (0 drops the row); copy_idx identifies each clone."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    def expand(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy()
        rep = (t.column("c_nationkey").to_numpy(zero_copy_only=False) % 3).astype(np.int64)
        idx = np.repeat(np.arange(len(k)), rep)
        within = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)[:-1])), rep
        )
        return pa.table({"c_custkey": k[idx], "copy_idx": within})

    return cust.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


SPLIT_SQL = """
SELECT c_custkey, UNNEST(range(0, c_nationkey % 3)) AS copy_idx FROM customer
"""


def q_attribute_fallback(sf_dir: str):
    """AttributeFallback.scala:19 — coalesce(primary, fallback)."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])

    def body(t: pa.Table) -> pa.Table:
        bal = t.column("c_acctbal")
        nullable = pc.if_else(pc.less(bal, 0.0), pa.scalar(None, pa.float64()), bal)
        return pa.table(
            {"c_custkey": t["c_custkey"], "bal": pc.coalesce(nullable, pa.scalar(0.0))}
        )

    return cust.map_batches(body, batch_format="pyarrow", zero_copy_batch=True)


FALLBACK_SQL = """
SELECT c_custkey,
       COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal
FROM customer
"""


def q_clustering_coefficient(sf_dir: str):
    from ..functions.graph.metrics import clustering_coefficient

    from .copurchase import copurchase_edges

    return clustering_coefficient(copurchase_edges(sf_dir))


CLUSTERING_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e3.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
pv AS (
  SELECT v, COUNT(*) AS t FROM (
    SELECT a AS v FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) GROUP BY v
),
vs AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
deg AS (
  SELECT v, COUNT(*) AS d FROM (
    SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges
  ) GROUP BY v
)
SELECT vs.v AS id,
       CASE WHEN deg.d < 2 THEN 0.0
            ELSE ROUND(COALESCE(pv.t, 0)::DOUBLE / (deg.d * (deg.d - 1) / 2.0), 6)
       END AS clustering
FROM vs JOIN deg ON deg.v = vs.v LEFT JOIN pv ON pv.v = vs.v
"""


def q_shortest_paths(sf_dir: str):
    from ..functions.graph.metrics import shortest_paths
    from .copurchase import copurchase_graph

    g = copurchase_graph(sf_dir, symmetric=True)
    src = _min_edge_vertex(sf_dir)
    dist = shortest_paths(g, src, max_iterations=30)
    reach = np.isfinite(dist)
    return pa.table(
        {"id": g.vids[reach], "dist": dist[reach].astype(np.int64)}
    )


def _min_edge_vertex(sf_dir: str) -> np.ndarray:
    from .copurchase import copurchase_edges

    e = copurchase_edges(sf_dir)
    m = None
    for b in e.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        lo = min(
            b["src"].to_numpy().min() if len(b) else np.iinfo(np.int64).max,
            b["dst"].to_numpy().min() if len(b) else np.iinfo(np.int64).max,
        )
        m = lo if m is None else min(m, lo)
    return np.array([m], dtype=np.int64)


def q_embeddedness(sf_dir: str):
    from ..functions.graph.triangles import embeddedness

    from .copurchase import copurchase_edges

    return embeddedness(copurchase_edges(sf_dir))


EMBEDDEDNESS_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges)
SELECT e.src, e.dst, COUNT(n2.dst) AS common
FROM edges e
LEFT JOIN sym n1 ON n1.src = e.src
LEFT JOIN sym n2 ON n2.src = e.dst AND n2.dst = n1.dst
GROUP BY 1, 2
"""


def q_two_hop(sf_dir: str):
    """ConcatenateBundles.scala:32 analog — compose customer→order and
    order→part bundles into distinct customer→part edges."""
    import pyarrow.parquet as pq

    from ..context import num_blocks_for
    from ..stages.edges import distinct

    o_path = f"{sf_dir}/orders.parquet"
    l_path = f"{sf_dir}/lineitem.parquet"
    orders = rd.read_parquet(o_path, columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(
        l_path,
        columns=["l_orderkey", "l_partkey"],
        override_num_blocks=num_blocks_for(pq.read_metadata(l_path).num_rows),
    )
    a = orders.map_batches(
        lambda t: pa.table({"k": t["o_orderkey"], "src": t["o_custkey"]}),
        batch_format="pyarrow",
    )
    b = li.map_batches(
        lambda t: pa.table({"k": t["l_orderkey"], "dst": t["l_partkey"]}),
        batch_format="pyarrow",
    )
    j = a.join(b, join_type="inner", num_partitions=8, on=("k",))
    return distinct(j.select_columns(["src", "dst"]), ["src", "dst"])


TWO_HOP_SQL = """
SELECT DISTINCT o_custkey AS src, l_partkey AS dst
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
"""


def q_sql_over_datasets(sf_dir: str):
    """ExecuteSQL analog — ad-hoc DuckDB over Arrow views of Datasets
    (oracle = the same SQL over the raw views; parity shows the bridge is
    faithful)."""
    from ..functions.sql import execute_sql

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    return execute_sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        FROM cust GROUP BY 1
        """,
        cust=cust,
    )


SQL_OVER_DS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer GROUP BY 1
"""

SHORTEST_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
sp(id, d) AS (
  SELECT (SELECT MIN(src) FROM sym), 0
  UNION
  SELECT e.dst, sp.d + 1 FROM sp JOIN sym e ON e.src = sp.id WHERE sp.d < 30
)
SELECT id, CAST(MIN(d) AS BIGINT) AS dist FROM sp GROUP BY id
"""
