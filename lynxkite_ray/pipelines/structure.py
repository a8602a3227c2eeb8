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
from ..context import default_partitions
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

# Copurchase graph CTE mirrored from __ray_entry__._EDGES_CTE (the oracle
# convention: all parts are vertices, co-purchased pairs are undirected
# edges).
COPUR_CTE = """
edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
vertices AS MATERIALIZED (SELECT p_partkey AS id FROM part),
nv AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM vertices)
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
    j = a.join(b, join_type="inner", num_partitions=default_partitions(), on=("k", "pos"))
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

    return clustering_coefficient(copurchase_edges(sf_dir), assume_canonical=True)


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

    return embeddedness(copurchase_edges(sf_dir), assume_canonical=True)


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
    j = a.join(b, join_type="inner", num_partitions=default_partitions(), on=("k",))
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

def q_edge_graph(sf_dir: str):
    """EdgeGraph.scala:18 — the line graph: each edge becomes a vertex
    (id = src·K + dst works for partkeys < K), connected when the first
    edge's head is the second's tail.  Hash join on the shared middle
    vertex."""
    e = precedence_edges(sf_dir)
    # Composite line-graph vertex id = src·K + dst is collision-free iff
    # dst < K; derive K = max(l_partkey)+1 at runtime (a fixed constant
    # silently collides once partkeys outgrow it) — the oracle SQL derives
    # the same scalar.
    K = (
        int(
            rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]).max(
                "l_partkey"
            )
        )
        + 1
    )

    a = e.map_batches(
        lambda t: pa.table(
            {
                "mid": t["dst"],
                "e_from": pc.add(
                    pc.multiply(t["src"], pa.scalar(K, pa.int64())), t["dst"]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    b = e.map_batches(
        lambda t: pa.table(
            {
                "mid": t["src"],
                "e_to": pc.add(
                    pc.multiply(t["src"], pa.scalar(K, pa.int64())), t["dst"]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    j = a.join(b, join_type="inner", num_partitions=default_partitions(), on=("mid",))
    return distinct(
        j.map_batches(
            lambda t: pa.table({"src": t["e_from"], "dst": t["e_to"]}),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
    )


EDGE_GRAPH_SQL = (
    "WITH "
    + PREC_CTE.strip()
    + """,
kk AS (SELECT MAX(l_partkey) + 1 AS k FROM lineitem)
SELECT DISTINCT a.src * kk.k + a.dst AS src, b.src * kk.k + b.dst AS dst
FROM prec a JOIN prec b ON a.dst = b.src CROSS JOIN kk
"""
)


def q_grow_segmentation(sf_dir: str):
    """GrowSegmentation.scala:22 analog — brand segments grown by one
    co-purchase hop: (brand, part) membership ∪ neighbors of members."""
    import pyarrow.parquet as pq

    from ..stages.partition import broadcast_lookup
    from .copurchase import copurchase_symmetric

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brand = dict(
        zip(part.column("p_partkey").to_pylist(), part.column("p_brand").to_pylist())
    )
    sym = copurchase_symmetric(sf_dir)
    # neighbor inherits the member's segment: edge (member → neighbor)
    grown = broadcast_lookup(sym, brand, "src", "segment").map_batches(
        lambda t: pa.table({"segment": t["segment"], "p_partkey": t["dst"]}),
        batch_format="pyarrow",
    )
    base = rd.from_arrow(
        pa.table(
            {
                "segment": part.column("p_brand"),
                "p_partkey": part.column("p_partkey"),
            }
        )
    )
    return distinct(base.union(grown), ["segment", "p_partkey"])


GROW_SEG_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges)
SELECT p_brand AS segment, p_partkey FROM part
UNION
SELECT p.p_brand AS segment, e.dst AS p_partkey
FROM sym e JOIN part p ON p.p_partkey = e.src
"""


def q_coloring(sf_dir: str):
    """Greedy Welsh-Powell coloring (rows-only: heuristic color count;
    validity asserted in tests)."""
    from ..functions.graph.coloring import greedy_coloring
    from .copurchase import copurchase_graph

    g = copurchase_graph(sf_dir, symmetric=False)
    colors = greedy_coloring(g)
    return pa.table({"id": g.vids, "color": colors})


def q_kmeans_clusters(sf_dir: str):
    """ClassifyWithModel analog — deterministic KMeans trained on the
    embeddings, scored by an actor pool.  SQL-oracled since r5: the init
    picks the 8 smallest md5-lower-64("13:id") rows, centroids live in
    float64 on both sides, and KMEANS_SQL unrolls the 5 Lloyd iterations
    (assignment tie-break = lowest cluster index, np.argmin's rule)."""
    from ..functions.models import classify_with_model, train_kmeans

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    centroids = train_kmeans(emb, k=8, iterations=5)
    return classify_with_model(emb, centroids).map_batches(
        lambda t: t.drop_columns(["dist"]), batch_format="pyarrow"
    )


def _kmeans_cte(k: int = 8, iterations: int = 5, seed: int = 13, dim: int = 64) -> str:
    """Unrolled-Lloyd WITH-chain shared by KMEANS_SQL and ANN_IVF_SQL:
    ends at cn{iterations} = (c, cv DOUBLE[], cn = ||c||²).  Assignment
    uses the engine's reduced distance (-2 v·c + ||c||², same argmin);
    empty clusters keep the previous centroid (the engine's nz mask);
    both sides compute in float64, so results differ only by summation
    order (~1e-16), far below any distance gap that decides an argmin."""
    parts = [
        f"""
WITH emb0 AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
dimx AS MATERIALIZED (
  SELECT vec_id, d.j, v[d.j] AS x
  FROM emb0 CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS j) d
),
cent0 AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (
           ORDER BY md5_number_lower('{seed}:' || vec_id), vec_id) - 1 AS c,
         v AS cv
  FROM emb0
  ORDER BY md5_number_lower('{seed}:' || vec_id), vec_id
  LIMIT {k}
),
cn0 AS MATERIALIZED (
  SELECT c, cv, list_inner_product(cv, cv) AS cn FROM cent0
)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
assign{i} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT e.vec_id, t.c,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY -2.0 * list_inner_product(e.v, t.cv) + t.cn ASC,
                      t.c ASC) AS rn
    FROM emb0 e CROSS JOIN cn{i - 1} t
  ) WHERE rn = 1
),
upd{i} AS MATERIALIZED (
  SELECT a.c, d.j, SUM(d.x) / COUNT(*) AS cx
  FROM assign{i} a JOIN dimx d USING (vec_id)
  GROUP BY a.c, d.j
),
cn{i} AS MATERIALIZED (
  SELECT p.c, COALESCE(u.cv, p.cv) AS cv,
         list_inner_product(COALESCE(u.cv, p.cv), COALESCE(u.cv, p.cv)) AS cn
  FROM cn{i - 1} p
  LEFT JOIN (SELECT c, list(cx ORDER BY j) AS cv FROM upd{i} GROUP BY c) u
    ON u.c = p.c
)"""
        )
    return "".join(parts)


def _kmeans_sql(k: int = 8, iterations: int = 5, seed: int = 13, dim: int = 64) -> str:
    return _kmeans_cte(k, iterations, seed, dim) + f"""
SELECT vec_id, CAST(c AS BIGINT) AS cluster FROM (
  SELECT e.vec_id, t.c,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY -2.0 * list_inner_product(e.v, t.cv) + t.cn ASC,
                    t.c ASC) AS rn
  FROM emb0 e CROSS JOIN cn{iterations} t
) WHERE rn = 1
ORDER BY vec_id
"""


KMEANS_SQL = _kmeans_sql()


def _ann_ivf_sql(
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 3,
    iterations: int = 5,
    seed: int = 13,
    dim: int = 64,
    n_queries: int = 5,
) -> str:
    """SQL replica of q_ann_ivf: the same unrolled-Lloyd coarse quantizer,
    max-cosine list assignment (ties → lowest centroid index, np.argmax's
    rule), per-query top-nprobe probe lists, union of probed lists, exact
    cosine top-k re-rank inside the probed set with the ANN_TOPK
    tie-break."""
    return _kmeans_cte(n_lists, iterations, seed, dim) + f""",
cnn AS MATERIALIZED (
  SELECT c, cv, CASE WHEN sqrt(cn) = 0 THEN 1.0 ELSE sqrt(cn) END AS nc
  FROM cn{iterations}
),
vcos AS MATERIALIZED (
  SELECT e.vec_id, t.c,
         list_inner_product(e.v, t.cv)
           / (sqrt(list_inner_product(e.v, e.v)) * t.nc) AS cos
  FROM emb0 e CROSS JOIN cnn t
),
vassign AS MATERIALIZED (
  SELECT vec_id, c AS ivf_list FROM (
    SELECT vec_id, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, c ASC) AS rn
    FROM vcos
  ) WHERE rn = 1
),
probe AS MATERIALIZED (
  SELECT DISTINCT c FROM (
    SELECT vec_id, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, c ASC) AS rn
    FROM vcos WHERE vec_id < {n_queries}
  ) WHERE rn <= {nprobe}
),
probed AS MATERIALIZED (
  SELECT vec_id FROM vassign WHERE ivf_list IN (SELECT c FROM probe)
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) DESC,
                    b.vec_id ASC) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
  WHERE a.vec_id < {n_queries}
    AND b.vec_id IN (SELECT vec_id FROM probed)
) WHERE rank <= {k}
"""


ANN_IVF_SQL = _ann_ivf_sql()


def q_modularity_by_brand(sf_dir: str):
    """Modularity.scala:30 analog — modularity of the p_brand partition of
    the co-purchase graph: Q = Σ_c [ e_c/m − (d_c/2m)² ] over undirected
    edges. Exact-rational inputs → ROUND(,6) both sides."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.partition import broadcast_lookup
    from ..stages.shuffle import grouped_aggregate
    from .copurchase import copurchase_edges

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brand = dict(
        zip(part.column("p_partkey").to_pylist(), part.column("p_brand").to_pylist())
    )
    canon = copurchase_edges(sf_dir)
    m = canon.count()
    wb = broadcast_lookup(
        broadcast_lookup(canon, brand, "src", "b_src"), brand, "dst", "b_dst"
    )

    # e_c: edges inside community c; d_c: total degree of community c
    def mark(t: pa.Table) -> pa.Table:
        same = pc.equal(t["b_src"], t["b_dst"])
        return pa.table(
            {
                "b_src": t["b_src"],
                "b_dst": t["b_dst"],
                "inside": pc.cast(same, pa.int64()),
            }
        )

    marked = wb.map_batches(mark, batch_format="pyarrow")
    inside = {
        r["b_src"]: r["e_in"]
        for r in grouped_aggregate(
            marked.map_batches(
                lambda t: t.filter(pc.equal(t["inside"], 1)).select(["b_src", "inside"]),
                batch_format="pyarrow",
            ),
            ["b_src"],
            [("inside", "sum", "e_in")],
        ).take_all()
    }
    deg_rows = grouped_aggregate(
        marked.map_batches(
            lambda t: pa.table(
                {
                    "b": pa.chunked_array([*t["b_src"].chunks, *t["b_dst"].chunks]),
                    "one": pa.array(np.ones(2 * t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["b"],
        [("one", "sum", "d")],
    ).take_all()
    q = 0.0
    for r in deg_rows:
        c = r["b"]
        e_c = inside.get(c, 0)
        d_c = r["d"]
        q += e_c / m - (d_c / (2.0 * m)) ** 2
    return pa.table({"modularity": round_away(np.array([q]), 6)})


MODULARITY_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
m AS (SELECT COUNT(*)::DOUBLE AS m FROM edges),
lab AS (SELECT p_partkey AS id, p_brand AS c FROM part),
marked AS (
  SELECT ls.c AS b_src, ld.c AS b_dst
  FROM edges e JOIN lab ls ON ls.id = e.src JOIN lab ld ON ld.id = e.dst
),
inside AS (SELECT b_src AS c, COUNT(*)::DOUBLE AS e_in FROM marked WHERE b_src = b_dst GROUP BY 1),
deg AS (
  SELECT c, COUNT(*)::DOUBLE AS d FROM (
    SELECT b_src AS c FROM marked UNION ALL SELECT b_dst FROM marked
  ) GROUP BY c
)
SELECT ROUND(SUM(COALESCE(i.e_in, 0) / (SELECT m FROM m)
             - POW(deg.d / (2 * (SELECT m FROM m)), 2)), 6) AS modularity
FROM deg LEFT JOIN inside i ON i.c = deg.c
"""


def q_key_intersection(sf_dir: str):
    """VertexSetIntersection (Intersections.scala:29) — customer ∩ supplier
    key spaces."""
    from ..stages.join import semi_join

    c = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow"
    )
    s = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow"
    )
    return distinct(semi_join(c, s, on="id"), ["id"])


INTERSECTION_SQL = (
    "SELECT c_custkey AS id FROM customer INTERSECT SELECT s_suppkey FROM supplier"
)


def q_adjacency_lists(sf_dir: str):
    """TripletMapping analog (TripletAttributes.scala:30) — per-vertex
    sorted out-neighbor list over the canonical co-purchase edges."""
    from ..stages.shuffle import hash_partition
    from .copurchase import copurchase_edges

    part = hash_partition(copurchase_edges(sf_dir), ["src"])

    def lists(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "neighbors": pa.array([], pa.string())}
            )
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        bound = np.empty(len(s), dtype=bool)
        bound[0] = True
        bound[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(bound)
        stops = np.append(starts[1:], len(s))
        # sorted neighbor list serialized (comparable/hashable for the
        # value-hash gate; the list-typed variant is a trivial cast away)
        neigh = [
            ",".join(map(str, d[a:b].tolist())) for a, b in zip(starts, stops)
        ]
        return pa.table(
            {"src": s[starts], "neighbors": pa.array(neigh, pa.string())}
        )

    return part.map_batches(lists, batch_format="pyarrow", zero_copy_batch=True)


ADJACENCY_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT src, array_to_string(list_sort(list(dst)), ',') AS neighbors
FROM edges GROUP BY src
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


# ------------------------------------------------------- bucketing family


def q_string_bucketing(sf_dir: str):
    """StringBucketing (Bucketing.scala:33-63) over order priorities:
    per-segment member counts, plus the invariant that each label maps to
    exactly one content-hash segment id (n_segments == 1 per label)."""
    from ray.data.aggregate import Count

    from ..stages.transform import string_bucketing

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.rename_columns(["id", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    from ..stages.shuffle import distinct

    b = string_bucketing(orders, "o_orderpriority").materialize()
    agg = b.groupby("label").aggregate(Count(alias_name="n"))
    # hash-consistency check folded into the result: distinct (label,
    # segment) per label must be 1 — count them per label and join
    nseg = (
        distinct(b.select_columns(["label", "segment"]), ["label", "segment"])
        .groupby("label")
        .aggregate(Count(alias_name="n_segments"))
    )
    return agg.join(nseg, join_type="inner", num_partitions=2, on=("label",))


STRING_BUCKETING_SQL = """
SELECT o_orderpriority AS label, COUNT(*) AS n, CAST(1 AS BIGINT) AS n_segments
FROM orders GROUP BY 1
"""


def q_double_bucketing(sf_dir: str):
    """DoubleBucketing (Bucketing.scala:86-117), overlapping: every
    customer belongs to two acctbal buckets of width 1000 (step 500)."""
    from ..stages.transform import double_bucketing

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda t: t.rename_columns(["id", "c_acctbal"]), batch_format="pyarrow"
    )
    return double_bucketing(cust, "c_acctbal", 1000.0, overlap=True)


DOUBLE_BUCKETING_SQL = """
WITH b AS (
  SELECT c_custkey AS id, CAST(FLOOR(c_acctbal / 500.0) AS BIGINT) AS bk
  FROM customer
)
SELECT id, bk - 1 AS bucket, (bk - 1) * 500.0 AS bottom,
       (bk - 1) * 500.0 + 1000.0 AS top FROM b
UNION ALL
SELECT id, bk, bk * 500.0, bk * 500.0 + 1000.0 FROM b
"""


def q_interval_bucketing(sf_dir: str):
    """IntervalBucketing (Bucketing.scala:145-177): each customer spans
    [acctbal, acctbal + 750] and lands in every width-1000 bucket the
    interval intersects."""
    from ..stages.transform import interval_bucketing

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda t: pa.table(
            {
                "id": t["c_custkey"],
                "begin": t["c_acctbal"],
                "end": pc.add(t["c_acctbal"], 750.0),
            }
        ),
        batch_format="pyarrow",
    )
    return interval_bucketing(cust, "begin", "end", 1000.0)


INTERVAL_BUCKETING_SQL = """
WITH e AS (
  SELECT c_custkey AS id,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS b0,
         CAST(FLOOR((c_acctbal + 750.0) / 1000.0) AS BIGINT) AS b1
  FROM customer
),
x AS (SELECT id, UNNEST(range(b0, b1 + 1)) AS bucket FROM e)
SELECT id, bucket, bucket * 1000.0 AS bottom, bucket * 1000.0 + 1000.0 AS top
FROM x
"""


def q_vertex_bucket_grid(sf_dir: str):
    """VertexBucketGrid.scala:33-80 — 2-D (acctbal × nationkey) bucket-count
    grid over customers."""
    from ..stages.transform import vertex_bucket_grid

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_acctbal", "c_nationkey"]
    )
    return vertex_bucket_grid(
        cust, "c_acctbal", "c_nationkey", -1000.0, 10000.0, 11, 0.0, 25.0, 5
    )


VERTEX_GRID_SQL = """
SELECT CAST(LEAST(GREATEST(FLOOR((c_acctbal + 1000.0) / 1000.0), 0), 10) AS BIGINT) AS xb,
       CAST(LEAST(GREATEST(FLOOR(c_nationkey / 5.0), 0), 4) AS BIGINT) AS yb,
       COUNT(*) AS n
FROM customer GROUP BY 1, 2
"""


# --------------------------------------- import-resolution + pulled-over


def q_import_edges_for_existing(sf_dir: str):
    """ImportEdgesForExistingVertices (ImportGraphFromTable.scala:46-79):
    a name-keyed edge list (supplier name → its nation's name) resolved to
    vertex ids through a unique (name → id) map; nation ids offset to keep
    the two vertex families disjoint."""
    from ..stages.edges import resolve_edges_by_keys
    from ..stages.join import broadcast_join

    sup = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    named = broadcast_join(
        sup, nat, on=["s_nationkey"], right_on=["n_nationkey"]
    ).map_batches(
        lambda t: pa.table({"src_name": t["s_name"], "dst_name": t["n_name"]}),
        batch_format="pyarrow",
    )
    sup_v = sup.map_batches(
        lambda t: pa.table({"key": t["s_name"], "id": t["s_suppkey"]}),
        batch_format="pyarrow",
    )
    nat_v = nat.map_batches(
        lambda t: pa.table(
            {
                "key": t["n_name"],
                "id": pc.add(pc.cast(t["n_nationkey"], pa.int64()), 1_000_000),
            }
        ),
        batch_format="pyarrow",
    )
    return resolve_edges_by_keys(named, sup_v.union(nat_v), "key", "id")


IMPORT_EDGES_SQL = """
SELECT s_suppkey AS src, CAST(n_nationkey AS BIGINT) + 1000000 AS dst
FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


def q_pulled_over_attribute(sf_dir: str):
    """PulledOverAttribute.scala:35 — customer acctbal pulled onto each of
    the customer's orders through the (custkey → orderkey) mapping."""
    from ..stages.edges import pulled_over_attribute

    attr = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda t: t.rename_columns(["id", "acctbal"]), batch_format="pyarrow"
    )
    mapping = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    ).map_batches(
        lambda t: t.rename_columns(["src", "dst"]), batch_format="pyarrow"
    )
    return pulled_over_attribute(attr, mapping)


PULLED_OVER_SQL = """
SELECT o_orderkey AS id, c_acctbal AS acctbal
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_modular_tweaks(sf_dir: str):
    """FindModularClusteringByTweaks.scala:521 analog (pinned; rows-only —
    modularity clustering is not SQL-expressible) over the directed
    precedence graph."""
    from ..functions.graph.tweaks import find_modular_clustering_by_tweaks

    return find_modular_clustering_by_tweaks(
        precedence_edges(sf_dir), max_iterations=4
    )


def q_pca(sf_dir: str):
    """Sphynx PCA analog — distributed covariance partials, local eigh,
    actor-pool projection (rows-only; projections verified against
    numpy.linalg in pytest).  The pc values are rounded so the value-hash
    is stable across BLAS builds."""
    from ..functions.models import pca_transform, train_pca

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    model = train_pca(emb, k=4)
    out = pca_transform(emb, model)

    def rnd(t: pa.Table) -> pa.Table:
        col = t.column("pc").combine_chunks()
        k = col.type.list_size
        P = np.round(col.flatten().to_numpy().reshape(-1, k), 6) + 0.0
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "pc": pa.FixedSizeListArray.from_arrays(
                    pa.array(P.ravel(), pa.float64()), k
                ),
            }
        )

    return out.map_batches(rnd, batch_format="pyarrow")


def q_node2vec(sf_dir: str):
    """Node2Vec analog (Sphynx node2vec slot) over the precedence graph:
    deterministic biased walks → PPMI factorization (rows-only)."""
    from ..functions.graph.node2vec import node2vec_embeddings

    return node2vec_embeddings(
        precedence_edges(sf_dir), dim=8, walk_length=8, walks_per_node=2
    )


def q_gcn_scores(sf_dir: str):
    """GCN classifier analog (sphynx/python/train_GCN_classifier.py slot):
    predict each part's size class from (retailprice, container-length)
    features + co-purchase structure; odd part keys are held out
    (rows-only; accuracy + determinism pytest)."""
    from ..functions.gcn import predict_gcn, train_gcn_classifier
    from .copurchase import copurchase_edges

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )

    def feats(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy()
        size = t.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
        cls = (size > 25).astype(np.int64)
        label = np.where(pk % 2 == 0, cls, -1)
        return pa.table(
            {
                "id": pk,
                "price": t.column("p_retailprice"),
                "sz": size.astype(np.float64),
                "label": label,
            }
        )

    f = part.map_batches(feats, batch_format="pyarrow").materialize()
    edges = copurchase_edges(sf_dir)
    model = train_gcn_classifier(edges, f, ["price", "sz"], "label", epochs=100)
    return predict_gcn(edges, f, model, ["price", "sz"])


def q_hypermap_coords(sf_dir: str):
    """HyperMap.scala:32 analog — hyperbolic coordinates of the precedence
    graph (rows-only; geometry invariants pytest-checked)."""
    from ..functions.graph.hyperbolic import hypermap

    return hypermap(precedence_edges(sf_dir))


def q_hyperbolic_prediction(sf_dir: str):
    """HyperbolicPrediction.scala:41 analog — top-100 predicted links from
    the HyperMap embedding (rows-only)."""
    from ..functions.graph.hyperbolic import hyperbolic_prediction, hypermap

    return hyperbolic_prediction(hypermap(precedence_edges(sf_dir)), size=100)


def q_tsne(sf_dir: str):
    """tsne.py (Sphynx python domain) analog — pinned exact t-SNE of the
    embeddings table (rows-only; cluster-separation pytest)."""
    from ..functions.tsne import tsne_embedding

    return tsne_embedding(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet"), iterations=250
    )


def q_log_histogram(sf_dir: str):
    """Logarithmic-axis histogram of positive acctbals (FE log bucketer)."""
    from ray.data.aggregate import Count

    from ..stages.transform import bucket_double_log

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_acctbal"])
    b = bucket_double_log(cust, "c_acctbal", 1.0, 10000.0, 8)
    return b.groupby("bucket").aggregate(Count(alias_name="n"))


LOG_HIST_SQL = """
SELECT CAST(LEAST(GREATEST(FLOOR(LN(c_acctbal) / (LN(10000.0) - LN(1.0)) * 8), 0), 7) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM customer WHERE c_acctbal > 0 GROUP BY 1
"""


def q_gcn_regression(sf_dir: str):
    """train_GCN_regressor.py analog — predict part retailprice from size
    + structure; odd keys held out (rows-only)."""
    from ..functions.gcn import predict_gcn_regressor, train_gcn_regressor
    from .copurchase import copurchase_edges

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_retailprice"]
    )

    def feats(t: pa.Table) -> pa.Table:
        pk = t.column("p_partkey").to_numpy()
        price = t.column("p_retailprice").to_numpy(zero_copy_only=False).astype(np.float64)
        y = np.where(pk % 2 == 0, price, np.nan)
        return pa.table(
            {
                "id": pk,
                "sz": t.column("p_size").to_numpy(zero_copy_only=False).astype(np.float64),
                "y": y,
            }
        )

    f = part.map_batches(feats, batch_format="pyarrow").materialize()
    edges = copurchase_edges(sf_dir)
    model = train_gcn_regressor(edges, f, ["sz"], "y", epochs=80)
    return predict_gcn_regressor(edges, f, model, ["sz"])


def q_core_numbers(sf_dir: str):
    """k-core decomposition of the co-purchase graph.  SQL-oracled since
    r5 via the iterated-H-index characterization (Lü et al. 2016: h₀ =
    degree, h_{t+1}(v) = H-index of neighbors' h_t, monotone ↓ to the core
    number): CORE_NUMBERS_SQL unrolls 24 rounds — the sf0.01 graph reaches
    its fixpoint in 19 (measured), and extra rounds are no-ops once
    converged.  Pytest additionally pins the peel against a naive oracle."""
    from ..functions.graph import core_number

    from .copurchase import copurchase_edges

    return core_number(copurchase_edges(sf_dir))


def _core_numbers_sql(rounds: int = 24) -> str:
    """Unrolled H-index iteration over the co-purchase graph.  H-index in
    SQL: sort each vertex's neighbor values descending, H = MAX(LEAST(rank,
    value)).  MATERIALIZED everywhere (see _pagerank_sql)."""
    parts = [
        """WITH edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
pairs AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
h0 AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS h FROM pairs GROUP BY src)""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
h{k} AS MATERIALIZED (
  SELECT id, MAX(LEAST(rn, nh)) AS h FROM (
    SELECT p.src AS id, q.h AS nh,
           ROW_NUMBER() OVER (PARTITION BY p.src ORDER BY q.h DESC) AS rn
    FROM pairs p JOIN h{k - 1} q ON q.id = p.dst
  ) GROUP BY id
)"""
        )
    parts.append(f"\nSELECT id, h AS core FROM h{rounds} ORDER BY id")
    return "\n".join(parts)


CORE_NUMBERS_SQL = _core_numbers_sql(24)


def q_reciprocity(sf_dir: str):
    from ..functions.graph.metrics import reciprocity

    return reciprocity(precedence_pairs(sf_dir))


RECIPROCITY_SQL = (
    "WITH "
    + PREC_CTE.strip()
    + """,
rec AS (SELECT e.src FROM prec e JOIN prec r ON r.src = e.dst AND r.dst = e.src)
SELECT CAST((SELECT COUNT(*) FROM prec) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM rec) AS BIGINT) AS n_reciprocal,
       ROUND(CAST((SELECT COUNT(*) FROM rec) AS DOUBLE)
             / (SELECT COUNT(*) FROM prec), 6) AS reciprocity
"""
)


def q_assortativity(sf_dir: str):
    from ..functions.graph.metrics import degree_assortativity

    from .copurchase import copurchase_edges

    return degree_assortativity(copurchase_edges(sf_dir))


ASSORTATIVITY_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
pairs AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM pairs GROUP BY 1)
SELECT ROUND(corr(dx.d, dy.d), 6) AS assortativity
FROM pairs JOIN deg dx ON dx.v = pairs.src JOIN deg dy ON dy.v = pairs.dst
"""


def q_adamic_adar(sf_dir: str):
    """Top-100 AA link-prediction candidates over the undirected
    precedence graph (sparser than co-purchase, so the wedge fan-out stays
    SQL-checkable at every sf)."""
    from ..functions.graph.metrics import adamic_adar

    return adamic_adar(precedence_edges(sf_dir), k=100)


ADAMIC_ADAR_SQL = (
    "WITH "
    + PREC_CTE.strip()
    + """,
edges AS (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
          FROM prec),
pairs AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM pairs GROUP BY 1),
wedge AS (
  SELECT b1.src AS a, b2.dst AS c, b1.dst AS mid
  FROM pairs b1 JOIN pairs b2 ON b1.dst = b2.src AND b1.src < b2.dst
),
cand AS (
  SELECT w.a AS src, w.c AS dst, SUM(1.0 / ln(deg.d)) AS aa
  FROM wedge w
  JOIN deg ON deg.v = w.mid
  LEFT JOIN edges e ON e.src = w.a AND e.dst = w.c
  WHERE e.src IS NULL
  GROUP BY 1, 2
)
SELECT src, dst, aa FROM (
  SELECT src, dst, ROUND(aa, 6) AS aa,
         ROW_NUMBER() OVER (ORDER BY ROUND(aa, 6) DESC, src ASC, dst ASC) AS rk
  FROM cand
) WHERE rk <= 100
"""
)


def q_scc(sf_dir: str):
    """Strongly connected components of the directed precedence graph.
    SQL-oracled since r5: pairwise mutual reachability via a recursive CTE
    (tractable at the sf0.01 gate scale); pytest additionally pins a
    Kosaraju oracle."""
    from ..functions.graph import strongly_connected_components

    return strongly_connected_components(precedence_edges(sf_dir))


SCC_SQL = (
    "WITH RECURSIVE "
    + PREC_CTE.strip()
    + """,
verts AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM prec UNION ALL SELECT dst FROM prec)
),
reach(a, b) AS (
  SELECT src, dst FROM prec
  UNION
  SELECT r.a, e.dst FROM reach r JOIN prec e ON e.src = r.b
),
mutual AS MATERIALIZED (
  SELECT r1.a AS v, r1.b AS u
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
)
SELECT verts.id, LEAST(verts.id, COALESCE(MIN(m.u), verts.id)) AS scc
FROM verts LEFT JOIN mutual m ON m.v = verts.id
GROUP BY verts.id
ORDER BY verts.id
"""
)


def q_bowtie(sf_dir: str):
    """Broder bowtie decomposition of the directed precedence graph.
    SQL-oracled since r5: SCC labels via the mutual-reachability closure
    (same CTE as SCC_SQL), core = largest SCC (tie → smallest label),
    IN/OUT via the same closure; pytest additionally pins BFS oracles on
    planted structure."""
    from ..functions.graph import bowtie

    return bowtie(precedence_edges(sf_dir))


BOWTIE_SQL = (
    "WITH RECURSIVE "
    + PREC_CTE.strip()
    + """,
verts AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM prec UNION ALL SELECT dst FROM prec)
),
reach(a, b) AS (
  SELECT src, dst FROM prec
  UNION
  SELECT r.a, e.dst FROM reach r JOIN prec e ON e.src = r.b
),
mutual AS MATERIALIZED (
  SELECT r1.a AS v, r1.b AS u
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
),
scc AS MATERIALIZED (
  SELECT verts.id, LEAST(verts.id, COALESCE(MIN(m.u), verts.id)) AS scc
  FROM verts LEFT JOIN mutual m ON m.v = verts.id
  GROUP BY verts.id
),
core AS MATERIALIZED (
  SELECT scc FROM (
    SELECT scc, COUNT(*) AS n FROM scc GROUP BY scc
    ORDER BY n DESC, scc ASC LIMIT 1
  )
),
corev AS MATERIALIZED (SELECT id FROM scc WHERE scc = (SELECT scc FROM core)),
fwd AS MATERIALIZED (
  SELECT DISTINCT r.b AS id FROM reach r JOIN corev c ON c.id = r.a
),
bwd AS MATERIALIZED (
  SELECT DISTINCT r.a AS id FROM reach r JOIN corev c ON c.id = r.b
)
SELECT s.id,
       CASE WHEN s.scc = (SELECT scc FROM core) THEN 'core'
            WHEN s.id IN (SELECT id FROM bwd) THEN 'in'
            WHEN s.id IN (SELECT id FROM fwd) THEN 'out'
            ELSE 'other' END AS region
FROM scc s ORDER BY s.id
"""
)


def q_personalized_pagerank(sf_dir: str):
    """PPR from the 10 smallest part ids over the co-purchase graph.
    SQL-oracled since r5 (unrolled teleport-weighted power iteration);
    pytest additionally pins a dict-loop oracle."""
    import ray.data as rd

    from ..functions.graph import personalized_pagerank

    from .copurchase import copurchase_graph

    g = copurchase_graph(sf_dir, symmetric=True)
    sources = g.vids[:10]
    ranks = personalized_pagerank(g, sources, damping=0.85, iterations=10)
    return rd.from_arrow(
        pa.table({"id": g.vids, "pprank": round_away(ranks, 6)})
    )


def _ppr_sql(iterations: int = 10, damping: float = 0.85, n_sources: int = 10) -> str:
    """Unrolled personalized PageRank: rank₀ = teleport (uniform over the
    ``n_sources`` smallest vertex ids), each round redistributes the lost
    (dangling) mass over the teleport vector so Σrank = 1 — mirroring
    functions/graph/pagerank.py::personalized_pagerank exactly."""
    parts = [
        "WITH "
        + COPUR_CTE.strip()
        + f""",
outdeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::DOUBLE AS wsum FROM sym GROUP BY src),
srcs AS MATERIALIZED (SELECT id FROM vertices ORDER BY id LIMIT {n_sources}),
tp AS MATERIALIZED (
  SELECT v.id, CASE WHEN s.id IS NOT NULL THEN 1.0 / {n_sources} ELSE 0.0 END AS tp
  FROM vertices v LEFT JOIN srcs s ON s.id = v.id
),
pr0 AS MATERIALIZED (SELECT id, tp AS rank FROM tp)"""
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f""",
inc{k} AS MATERIALIZED (
  SELECT e.dst AS id, {damping} * SUM(p.rank / d.wsum) AS inc
  FROM sym e
  JOIN pr{k - 1} p ON p.id = e.src
  JOIN outdeg d ON d.id = e.src
  GROUP BY e.dst
),
pr{k} AS MATERIALIZED (
  SELECT v.id,
         (1.0 - (SELECT COALESCE(SUM(inc), 0) FROM inc{k})) * t.tp
         + COALESCE(i.inc, 0) AS rank
  FROM vertices v
  JOIN tp t ON t.id = v.id
  LEFT JOIN inc{k} i ON i.id = v.id
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(rank, 6) AS pprank FROM pr{iterations} ORDER BY id"
    )
    return "\n".join(parts)


PPR_SQL = _ppr_sql(10, 0.85, 10)


# Radius-2 snowball ball around the smallest vertex id (the __ray_entry__
# snowball_sample query): depth-limited BFS, MIN(d) collapses walks.
SNOWBALL_SQL = (
    "WITH RECURSIVE "
    + COPUR_CTE.strip()
    + """,
sp(id, d) AS (
  SELECT (SELECT MIN(id) FROM vertices), 0
  UNION
  SELECT e.dst, sp.d + 1 FROM sp JOIN sym e ON e.src = sp.id WHERE sp.d < 2
)
SELECT id, CAST(MIN(d) AS BIGINT) AS dist FROM sp GROUP BY id ORDER BY id
"""
)


# Exact Backstrom–Kleinberg dispersion over the precedence graph (the
# __ray_entry__ dispersion query): common = N(u)∩N(v)\{u,v}; a pair
# (a, b) ⊆ common counts iff a∉N(b) and no t exists with t~a, t~b, t~u,
# t≠v (the restricted-neighborhood intersection) — a literal SQL replay
# of functions/graph/dispersion.py::_dispersion_chunk.
DISPERSION_SQL = (
    "WITH "
    + PREC_CTE.strip()
    + """,
e AS MATERIALIZED (SELECT src, dst FROM prec),
dsym AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
common AS MATERIALIZED (
  SELECT e.src AS u, e.dst AS v, n1.dst AS c
  FROM e
  JOIN dsym n1 ON n1.src = e.src
  JOIN dsym n2 ON n2.src = e.dst AND n2.dst = n1.dst
  WHERE n1.dst <> e.dst
),
pairs AS MATERIALIZED (
  SELECT a.u, a.v, a.c AS ca, b.c AS cb
  FROM common a JOIN common b ON a.u = b.u AND a.v = b.v AND a.c < b.c
),
good AS MATERIALIZED (
  SELECT u, v, COUNT(*)::DOUBLE AS score
  FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM dsym s WHERE s.src = p.ca AND s.dst = p.cb)
    AND NOT EXISTS (
      SELECT 1
      FROM dsym ta
      JOIN dsym tb ON tb.dst = ta.dst
      JOIN dsym tu ON tu.dst = ta.dst
      WHERE ta.src = p.ca AND tb.src = p.cb AND tu.src = p.u AND ta.dst <> p.v
    )
  GROUP BY u, v
)
SELECT e.src, e.dst, COALESCE(g.score, 0.0) AS dispersion
FROM e LEFT JOIN good g ON g.u = e.src AND g.v = e.dst
ORDER BY e.src, e.dst
"""
)


def q_effective_diameter(sf_dir: str):
    """HyperANF 90% effective diameter of the co-purchase graph — one-row
    scalar.  SQL-oracled since r5: the sketch hashes with md5-lower-64, so
    the oracle replays the register propagation, per-round neighborhood
    function and interpolation exactly (the 'approximation' is vs the true
    distance distribution, pytest-toleranced — not vs reruns).  Rounded to
    6 decimals on both sides (summation-order float noise)."""
    import ray.data as rd

    from ..functions.graph.hyperball import effective_diameter
    from ..util import round_away

    from .copurchase import copurchase_graph

    g = copurchase_graph(sf_dir, symmetric=True)
    res = effective_diameter(g, q=0.9, max_diameter=30)
    return rd.from_arrow(
        pa.table(
            {
                "effective_diameter": round_away(
                    np.array([res["effective_diameter"]], np.float64), 6
                ),
                "rounds": np.array([len(res["rounds"]) - 1], np.int64),
            }
        )
    )


def q_resource_allocation(sf_dir: str):
    """Top-100 resource-allocation-index candidates (same kernel as
    adamic_adar with f = 1/deg)."""
    from ..functions.graph.metrics import adamic_adar

    return adamic_adar(precedence_edges(sf_dir), k=100, weight="resource_allocation")


RESOURCE_ALLOCATION_SQL = (
    "WITH "
    + PREC_CTE.strip()
    + """,
edges AS (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
          FROM prec),
pairs AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM pairs GROUP BY 1),
wedge AS (
  SELECT b1.src AS a, b2.dst AS c, b1.dst AS mid
  FROM pairs b1 JOIN pairs b2 ON b1.dst = b2.src AND b1.src < b2.dst
),
cand AS (
  SELECT w.a AS src, w.c AS dst, SUM(1.0 / deg.d) AS aa
  FROM wedge w
  JOIN deg ON deg.v = w.mid
  LEFT JOIN edges e ON e.src = w.a AND e.dst = w.c
  WHERE e.src IS NULL
  GROUP BY 1, 2
)
SELECT src, dst, aa FROM (
  SELECT src, dst, ROUND(aa, 6) AS aa,
         ROW_NUMBER() OVER (ORDER BY ROUND(aa, 6) DESC, src ASC, dst ASC) AS rk
  FROM cand
) WHERE rk <= 100
"""
)


def q_hits(sf_dir: str):
    """HITS hubs/authorities on the directed precedence graph, SQL-oracled
    via the unrolled 30-round power iteration in HITS_SQL (pytest
    additionally pins a dense numpy oracle).  6-decimal rounding: the
    engine may early-stop at tol=1e-9, which is invisible at 1e-6 but not
    at the 9-decimal rounding this query used through r4."""
    import ray.data as rd

    from ..functions.graph import Graph, hits

    g = Graph.from_edges(precedence_edges(sf_dir))
    hub, auth = hits(g, iterations=30)
    return rd.from_arrow(
        pa.table(
            {
                "id": g.vids,
                "hub": round_away(hub, 6),
                "authority": round_away(auth, 6),
            }
        )
    )


def _hits_sql(iterations: int = 30) -> str:
    """Unrolled HITS power iteration over the precedence graph — mirrors
    functions/graph/hits.py:51 exactly: a ← normalize(Aᵀh), h ←
    normalize(Aa), L2 norms.  The constant initial h cancels after the
    first normalization, so h0 = 1 suffices.  Every CTE is MATERIALIZED
    (DuckDB would otherwise inline each round's result into the next —
    exponential plan, see _pagerank_sql)."""
    parts = [
        "WITH " + PREC_CTE.strip().rstrip() + ",",
        """verts AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM prec UNION ALL SELECT dst FROM prec)
),
h0 AS MATERIALIZED (SELECT id, 1.0::DOUBLE AS h FROM verts)""",
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f""",
ar{k} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(p.h) AS v FROM prec e JOIN h{k - 1} p ON p.id = e.src GROUP BY e.dst
),
a{k} AS MATERIALIZED (
  SELECT verts.id,
         COALESCE(r.v, 0) / (SELECT CASE WHEN SQRT(SUM(v * v)) > 0
                                    THEN SQRT(SUM(v * v)) ELSE 1 END FROM ar{k}) AS a
  FROM verts LEFT JOIN ar{k} r ON r.id = verts.id
),
hr{k} AS MATERIALIZED (
  SELECT e.src AS id, SUM(p.a) AS v FROM prec e JOIN a{k} p ON p.id = e.dst GROUP BY e.src
),
h{k} AS MATERIALIZED (
  SELECT verts.id,
         COALESCE(r.v, 0) / (SELECT CASE WHEN SQRT(SUM(v * v)) > 0
                                    THEN SQRT(SUM(v * v)) ELSE 1 END FROM hr{k}) AS h
  FROM verts LEFT JOIN hr{k} r ON r.id = verts.id
)"""
        )
    parts.append(
        f"""
SELECT verts.id, ROUND(h{iterations}.h, 6) AS hub, ROUND(a{iterations}.a, 6) AS authority
FROM verts JOIN h{iterations} ON h{iterations}.id = verts.id
JOIN a{iterations} ON a{iterations}.id = verts.id
ORDER BY verts.id"""
    )
    return "\n".join(parts)


HITS_SQL = _hits_sql(30)


def q_katz(sf_dir: str):
    """Katz centrality on the directed precedence graph (reference menu:
    GraphComputationOperations.scala:95 'Compute centrality' katz).
    α = 0.05 < 1/λmax ≈ 1/15 at the gate scale; fixed 30 rounds — the SQL
    oracle replays the identical truncated series."""
    import ray.data as rd

    from ..functions.graph import Graph, katz

    g = Graph.from_edges(precedence_edges(sf_dir))
    x = katz(g, alpha=0.05, beta=1.0, iterations=30)
    return rd.from_arrow(pa.table({"id": g.vids, "katz": round_away(x, 6)}))


def _katz_sql(alpha: float = 0.05, beta: float = 1.0, iterations: int = 30) -> str:
    """Unrolled x ← α·Aᵀx + β over the precedence graph, x₀ = 0."""
    parts = [
        "WITH " + PREC_CTE.strip() + ",",
        """verts AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM prec UNION ALL SELECT dst FROM prec)
),
x0 AS MATERIALIZED (SELECT id, 0.0::DOUBLE AS x FROM verts)""",
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f""",
g{k} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(p.x) AS v FROM prec e JOIN x{k - 1} p ON p.id = e.src GROUP BY e.dst
),
x{k} AS MATERIALIZED (
  SELECT verts.id, {alpha} * COALESCE(g{k}.v, 0) + {beta} AS x
  FROM verts LEFT JOIN g{k} ON g{k}.id = verts.id
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(x, 6) AS katz FROM x{iterations} ORDER BY id"
    )
    return "\n".join(parts)


KATZ_SQL = _katz_sql(0.05, 1.0, 30)


def q_eigenvector(sf_dir: str):
    """Eigenvector centrality on the symmetrized precedence graph
    (GraphComputationOperations.scala:96 eigenvector): 50 fixed power-
    iteration rounds, L2-normalized — mirrored exactly by the unrolled SQL."""
    import ray.data as rd

    from ..functions.graph import Graph, eigenvector_centrality
    from ..stages.edges import symmetrize

    g = Graph.from_edges(symmetrize(precedence_edges(sf_dir)))
    x = eigenvector_centrality(g, iterations=50)
    return rd.from_arrow(
        pa.table({"id": g.vids, "eigenvector": round_away(x, 6)})
    )


def _eigenvector_sql(iterations: int = 50) -> str:
    parts = [
        "WITH " + PREC_CTE.strip() + ",",
        """spairs AS MATERIALIZED (
  SELECT src, dst FROM prec UNION SELECT dst, src FROM prec
),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM spairs),
nv AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM verts),
e0 AS MATERIALIZED (SELECT id, 1.0 / SQRT((SELECT n FROM nv)) AS x FROM verts)""",
    ]
    for k in range(1, iterations + 1):
        parts.append(
            f""",
g{k} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(p.x) AS v FROM spairs e JOIN e{k - 1} p ON p.id = e.src GROUP BY e.dst
),
e{k} AS MATERIALIZED (
  SELECT verts.id,
         COALESCE(g{k}.v, 0) / (SELECT CASE WHEN SQRT(SUM(v * v)) > 0
                                       THEN SQRT(SUM(v * v)) ELSE 1 END FROM g{k}) AS x
  FROM verts LEFT JOIN g{k} ON g{k}.id = verts.id
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(x, 6) AS eigenvector FROM e{iterations} ORDER BY id"
    )
    return "\n".join(parts)


EIGENVECTOR_SQL = _eigenvector_sql(50)


# ------------------------------------------- closeness-family centralities

_N_CLOSENESS_SOURCES = 100

# Shared BFS stats CTE: exact per-source (reach incl. self, Σdist) for the
# 100 smallest vertex ids — walk enumeration bounded at depth 8 (measured
# copurchase diameter is 3 at sf0.01 / 2 at sf0.001; the bound dominates
# oracle cost because walks, not distances, are enumerated: depth 40 took
# 80 s per oracle, depth 8 takes 11 s), MIN(d) collapses walks to
# distances.
_BFS_STATS_CTE = (
    "WITH RECURSIVE "
    + COPUR_CTE.strip()
    + f""",
srcs AS MATERIALIZED (SELECT id FROM vertices ORDER BY id LIMIT {_N_CLOSENESS_SOURCES}),
sp(s, id, d) AS (
  SELECT id, id, 0 FROM srcs
  UNION
  SELECT sp.s, e.dst, sp.d + 1 FROM sp JOIN sym e ON e.src = sp.id WHERE sp.d < 8
),
dmin AS MATERIALIZED (SELECT s, id, MIN(d) AS d FROM sp GROUP BY s, id),
stats AS MATERIALIZED (
  SELECT s, COUNT(*)::DOUBLE AS r, SUM(d)::DOUBLE AS sumd FROM dmin GROUP BY s
)"""
)


def _closeness_sources(sf_dir: str):
    from .copurchase import copurchase_graph

    g = copurchase_graph(sf_dir, symmetric=True)
    return g, g.vids[:_N_CLOSENESS_SOURCES]


def q_closeness(sf_dir: str):
    """Wasserman–Faust closeness for the 100 smallest part ids over the
    co-purchase graph (reference menu: GraphComputationOperations.scala:49
    'Compute centrality' closeness estimate — the estimate samples BFS
    sources; here the query's source set IS the sample, each exact)."""
    from ..functions.graph.closeness import closeness_centrality

    g, srcs = _closeness_sources(sf_dir)
    return closeness_centrality(g, srcs)


CLOSENESS_SQL = (
    _BFS_STATS_CTE
    + """
SELECT s AS id,
       ROUND(CASE WHEN r > 1 AND sumd > 0
                  THEN (r - 1) * (r - 1) / (sumd * ((SELECT n FROM nv) - 1))
                  ELSE 0.0 END, 6) AS closeness
FROM stats ORDER BY s
"""
)


def q_lin_centrality(sf_dir: str):
    """Lin's index for the 100 smallest part ids
    (GraphComputationOperations.scala:101 'Compute centrality' lin)."""
    from ..functions.graph.closeness import lin_centrality

    g, srcs = _closeness_sources(sf_dir)
    return lin_centrality(g, srcs)


LIN_SQL = (
    _BFS_STATS_CTE
    + """
SELECT s AS id,
       ROUND(CASE WHEN sumd > 0 THEN r * r / sumd ELSE 1.0 END, 6) AS lin
FROM stats ORDER BY s
"""
)


def q_average_distance(sf_dir: str):
    """Sampled average shortest-path distance (sources = 100 smallest part
    ids; GraphComputationOperations.scala:108 'Compute centrality' average
    distance) — one scalar row."""
    from ..functions.graph.closeness import average_distance

    g, srcs = _closeness_sources(sf_dir)
    return average_distance(g, srcs)


AVG_DISTANCE_SQL = (
    _BFS_STATS_CTE
    + """
SELECT ROUND(CASE WHEN SUM(r - 1) > 0 THEN SUM(sumd) / SUM(r - 1) ELSE 0.0 END, 6)
       AS avg_distance
FROM stats
"""
)


def q_diameter(sf_dir: str):
    """'Compute diameter' (GraphComputationOperations.scala:184): max
    eccentricity over the 100 smallest part ids — exact per source, a
    certified diameter lower bound (the reference's max_error>0 estimate
    shape; exact diameter = sources set to all vertices)."""
    from ..functions.graph.closeness import diameter_lower_bound

    g, srcs = _closeness_sources(sf_dir)
    return diameter_lower_bound(g, srcs)


DIAMETER_SQL = (
    _BFS_STATS_CTE
    + f"""
SELECT CAST(MAX(d) AS BIGINT) AS diameter_lower,
       CAST((SELECT COUNT(*) FROM srcs) AS BIGINT) AS n_sources
FROM dmin
"""
)


def q_spanning_forest(sf_dir: str):
    """'Find optimal spanning tree' (GraphComputationOperations.scala:251,
    RandomMaximumSpanningForest analog): maximum-weight spanning forest of
    the multiplicity-weighted co-purchase graph, seeded deterministic
    tie-break — rows-only (union-find is not SQL-expressible; forest
    weight pinned vs an independent Kruskal in pytest)."""
    from ..functions.graph.spanning import max_spanning_forest
    from ..stages.edges import edge_multiplicity

    from .copurchase import copurchase_edges

    mult = edge_multiplicity(copurchase_edges(sf_dir)).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "w": pc.cast(t["multiplicity"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    return max_spanning_forest(mult, weight_col="w")


def q_pivot_mds(sf_dir: str):
    """'Place vertices with edge lengths' (GraphComputationOperations.
    scala:130, PivotMDS): 2-D layout of the co-purchase graph — rows-only
    (eigendecomposition is not SQL-expressible; barbell-separation +
    determinism pinned in pytest)."""
    from ..functions.graph.layout import pivot_mds

    from .copurchase import copurchase_graph

    g = copurchase_graph(sf_dir, symmetric=True)
    return pivot_mds(g, dimensions=2, pivots=64, seed=1)


def q_laplacian_centrality(sf_dir: str):
    """Unweighted Laplacian centrality over the co-purchase graph, every
    part (GraphComputationOperations.scala:99 'Compute centrality'
    laplacian) — Dataset-plane: degree aggregate + one hash join +
    grouped neighbor-degree sum."""
    from ..functions.graph.closeness import laplacian_centrality
    from .copurchase import copurchase_symmetric, part_vertices

    vertices = rd.from_arrow(pa.table({"id": part_vertices(sf_dir)}))
    out = laplacian_centrality(copurchase_symmetric(sf_dir), vertices)
    return out.map_batches(
        lambda t: pa.table(
            {
                "id": t["id"],
                "lap": pa.array(
                    round_away(
                        t.column("lap").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )


LAPLACIAN_SQL = (
    "WITH "
    + COPUR_CTE.strip()
    + """,
deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::DOUBLE AS d FROM sym GROUP BY src),
nsum AS MATERIALIZED (
  SELECT e.src AS id, SUM(dd.d) AS s FROM sym e JOIN deg dd ON dd.id = e.dst GROUP BY e.src
)
SELECT v.id,
       ROUND(COALESCE(dg.d, 0) * COALESCE(dg.d, 0) + COALESCE(dg.d, 0)
             + 2 * COALESCE(ns.s, 0), 6) AS lap
FROM vertices v
LEFT JOIN deg dg ON dg.id = v.id
LEFT JOIN nsum ns ON ns.id = v.id
ORDER BY v.id
"""
)


def q_steiner_tree(sf_dir: str):
    """Find Steiner tree (GraphComputationOperations.scala:411 /
    Dapcstp.scala) — exact Dreyfus-Wagner over the precedence subgraph
    induced on part ids < 400, synthetic deterministic edge costs
    ((src + dst) % 7 + 1), terminals = the 5 smallest part ids present.
    Rows-only: the DP is not SQL-expressible; pytest pins planted trees
    and a brute-force differential."""
    import pyarrow.compute as pc

    from ..functions.graph import steiner_tree

    e = precedence_edges(sf_dir).map_batches(
        lambda t: t.filter(
            pc.and_(pc.less(t["src"], 400), pc.less(t["dst"], 400))
        ),
        batch_format="pyarrow",
    )

    def with_cost(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table(
            {
                "src": s,
                "dst": d,
                "cost": ((s + d) % 7 + 1).astype(np.float64),
            }
        )

    weighted = e.map_batches(with_cost, batch_format="pyarrow").materialize()
    ids = []
    for b in weighted.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        ids.append(b["src"].to_numpy())
        ids.append(b["dst"].to_numpy())
    terms = np.unique(np.concatenate(ids))[:5] if ids else []
    return steiner_tree(weighted, terms, weight_col="cost")


def q_pagerank_converged(sf_dir: str):
    """North-rule convergence mode: power iteration with tol=1e-6 early
    stop (max 100 rounds) instead of a fixed iteration count.  SQL-oracled
    since r5: at sf0.01 the co-purchase graph converges after 8 rounds
    (measured; the driver gate runs only at sf0.01), so the oracle is the
    8-round unrolled _pagerank_sql.  6-decimal rounding — summation-order
    noise across ~8 float64 rounds is ~1e-12, invisible at 1e-6."""
    import ray.data as rd

    from ..functions.graph import pagerank

    from .copurchase import copurchase_graph

    g = copurchase_graph(sf_dir, symmetric=True)
    ranks = pagerank(g, damping=0.85, iterations=100, tol=1e-6)
    return rd.from_arrow(pa.table({"id": g.vids, "rank": round_away(ranks, 6)}))


# --------------------------------------------------------------- geo lookup


def q_lookup_region(sf_dir: str):
    """LookupRegion.scala:46-90 — first-containing-region attribute lookup
    over synthetic (lat, lon) points derived from customer keys; a diamond
    region is checked before the quadrant rectangles so the first-match
    rule is exercised.  Unmatched points are dropped (none here: lat/lon
    are x.5 offsets so no point sits on a region boundary)."""
    import numpy as np

    from ..functions.geo import lookup_region

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def coords(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "id": k,
                "lat": ((k * 37) % 181) - 89.5,
                "lon": ((k * 91) % 361) - 179.5,
            }
        )

    pts = cust.map_batches(coords, batch_format="pyarrow")
    d = 30.25
    regions = [
        ("diamond", np.array([(d, 0.0), (0.0, d), (-d, 0.0), (0.0, -d)])),
        ("ne", np.array([(0.25, 0.25), (200.0, 0.25), (200.0, 100.0), (0.25, 100.0)])),
        ("nw", np.array([(-200.0, 0.25), (-0.25, 0.25), (-0.25, 100.0), (-200.0, 100.0)])),
        ("se", np.array([(0.25, -100.0), (200.0, -100.0), (200.0, -0.25), (0.25, -0.25)])),
        ("sw", np.array([(-200.0, -100.0), (-0.25, -100.0), (-0.25, -0.25), (-200.0, -0.25)])),
    ]
    return lookup_region(pts, regions, out="region")


LOOKUP_REGION_SQL = """
WITH pts AS (
  SELECT c_custkey AS id,
         ((c_custkey * 37) % 181) - 89.5 AS lat,
         ((c_custkey * 91) % 361) - 179.5 AS lon
  FROM customer
)
SELECT id, lat, lon,
  CASE
    WHEN ABS(lat) + ABS(lon) < 30.25 THEN 'diamond'
    WHEN lon > 0.25 AND lat > 0.25 THEN 'ne'
    WHEN lon < -0.25 AND lat > 0.25 THEN 'nw'
    WHEN lon > 0.25 AND lat < -0.25 THEN 'se'
    ELSE 'sw'
  END AS region
FROM pts
"""


def q_segment_by_proximity(sf_dir: str):
    """'Segment by geographical proximity'
    (BuildSegmentationOperations.scala:563) over the same synthetic
    points as lookup_region, with four axis-aligned quadrant rectangles
    and a 5-degree buffer — multi-match belongsTo pairs (points in the
    0.5-wide gaps match BOTH adjacent quadrants).  SQL-oracled: distance
    to an axis-aligned rectangle is GREATEST-arithmetic, recomputed
    verbatim (for convex regions inside-or-within-d-of-boundary equals
    region distance ≤ d, which is what the engine's PIP + segment
    distance computes)."""
    import numpy as np

    from ..functions.geo import segment_by_proximity

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def coords(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "id": k,
                "lat": ((k * 37) % 181) - 89.5,
                "lon": ((k * 91) % 361) - 179.5,
            }
        )

    pts = cust.map_batches(coords, batch_format="pyarrow")
    regions = [
        ("ne", np.array([(0.25, 0.25), (200.0, 0.25), (200.0, 100.0), (0.25, 100.0)])),
        ("nw", np.array([(-200.0, 0.25), (-0.25, 0.25), (-0.25, 100.0), (-200.0, 100.0)])),
        ("se", np.array([(0.25, -100.0), (200.0, -100.0), (200.0, -0.25), (0.25, -0.25)])),
        ("sw", np.array([(-200.0, -100.0), (-0.25, -100.0), (-0.25, -0.25), (-200.0, -0.25)])),
    ]
    return segment_by_proximity(pts, regions, distance=5.0)


# dist²(point, axis-aligned rect) = GREATEST(xmin-x, 0, x-xmax)² +
# GREATEST(ymin-y, 0, y-ymax)²; match iff ≤ 25 (5-degree buffer)
_PROX_RECTS = [
    ("ne", 0.25, 200.0, 0.25, 100.0),
    ("nw", -200.0, -0.25, 0.25, 100.0),
    ("se", 0.25, 200.0, -100.0, -0.25),
    ("sw", -200.0, -0.25, -100.0, -0.25),
]

SEGMENT_BY_PROXIMITY_SQL = (
    """
WITH pts AS MATERIALIZED (
  SELECT c_custkey AS id,
         ((c_custkey * 37) % 181) - 89.5 AS lat,
         ((c_custkey * 91) % 361) - 179.5 AS lon
  FROM customer
)
"""
    + "\nUNION ALL\n".join(
        f"""SELECT id, '{name}' AS segment FROM pts
WHERE POWER(GREATEST({x0} - lon, 0, lon - {x1}), 2)
    + POWER(GREATEST({y0} - lat, 0, lat - {y1}), 2) <= 25.0"""
        for name, x0, x1, y0, y1 in _PROX_RECTS
    )
)


def q_betweenness(sf_dir: str):
    """Sampled Brandes betweenness over the co-purchase graph (rows-only:
    sampling estimator; exact closed forms + estimator quality pinned in
    tests/test_graph.py)."""
    from ..functions.graph.betweenness import betweenness
    from .copurchase import copurchase_edges

    return betweenness(copurchase_edges(sf_dir), k_samples=64, seed=7)


def q_forest_fire(sf_dir: str):
    """Forest-fire edge scores over the precedence graph
    (EdgeAttributeOperations.scala:222; NetworKit ForestFireScore) —
    rows-only: randomized simulation, pinned deterministic by per-fire
    seeding; pytest pins determinism + range + burn coverage."""
    from ..functions.graph.forestfire import forest_fire_score

    return forest_fire_score(
        precedence_edges(sf_dir), spread_prob=0.5, burn_ratio=2.0, seed=42
    )


def q_k_path(sf_dir: str):
    """K-Path centrality over the precedence graph
    (GraphComputationOperations.scala:100; NetworKit KPathCentrality) —
    rows-only: randomized walk estimate, pinned deterministic by per-walk
    seeding; pytest pins determinism + a hub-vs-leaf ordering oracle."""
    from ..functions.graph.forestfire import k_path_centrality

    return k_path_centrality(precedence_edges(sf_dir), k=5, walks=20_000, seed=42)
