"""Driver queries for the segmentation operator battery, each with an
exact DuckDB oracle (brand/mktsegment segmentations over the TPC-H-ish
fixtures; event-sequence segments over the events table)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.segmentation import (
    combine_segmentations,
    edges_from_segmentation,
    merge_vertices_full,
    segment_by_event_sequence,
)


def _brand_belongs(sf_dir: str):
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    return part.map_batches(
        lambda t: pa.table({"id": t["p_partkey"], "segment": t["p_brand"]}),
        batch_format="pyarrow",
    )


def q_edges_from_segmentation(sf_dir: str):
    """EdgesFromSegmentation.scala:25 — co-purchase part edges lifted onto
    the brand segmentation, with multiplicities."""
    from .copurchase import copurchase_edges

    return edges_from_segmentation(copurchase_edges(sf_dir), _brand_belongs(sf_dir))


EDGES_FROM_SEG_SQL = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT pa.p_brand AS seg_src, pb.p_brand AS seg_dst, COUNT(*) AS n_edges
FROM edges
JOIN part pa ON pa.p_partkey = edges.src
JOIN part pb ON pb.p_partkey = edges.dst
GROUP BY 1, 2
"""


def q_combine_segmentations(sf_dir: str):
    """CombineSegmentations.scala:32 — brand × size-bucket segmentation of
    parts (segment key = brand | size%5)."""
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    )
    def size_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        sizes = t.column("p_size").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id": t["p_partkey"],
                "segment": pa.array((sizes % 5).astype(str), pa.string()),
            }
        )

    size_seg = part.map_batches(size_bucket, batch_format="pyarrow")
    return combine_segmentations(_brand_belongs(sf_dir), size_seg)


COMBINE_SEG_SQL = """
SELECT p_partkey AS id,
       p_brand || '|' || CAST(p_size % 5 AS VARCHAR) AS segment
FROM part
"""


def q_merge_vertices_full(sf_dir: str):
    """MergeVertices.scala:36-75 full output over customers keyed by
    market segment: (id, segment, representative=min member id)."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    return merge_vertices_full(cust, "c_mktsegment", "c_custkey")


MERGE_FULL_SQL = """
SELECT c_custkey AS id, c_mktsegment AS segment,
       MIN(c_custkey) OVER (PARTITION BY c_mktsegment) AS representative
FROM customer
"""


def q_segment_by_event_sequence(sf_dir: str):
    """SegmentByEventSequence.scala:138 analog — event-type bigrams within
    a 60-minute window per user."""
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"],
    )
    return segment_by_event_sequence(events, window_minutes=60)


SEGMENT_EVENTS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS t1, ts,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts2
  FROM events
)
SELECT DISTINCT user_id, t1 || '>' || t2 AS segment
FROM seq
WHERE t2 IS NOT NULL AND ts2 - ts <= INTERVAL 60 MINUTE
"""


def _order_members(sf_dir: str):
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return li.map_batches(
        lambda t: pa.table({"segment": t["l_orderkey"], "member": t["l_partkey"]}),
        batch_format="pyarrow",
    )


def q_set_overlap(sf_dir: str):
    """SetOverlap.scala:25 — orders as (overlapping) part-sets; edges
    between orders sharing ≥ 2 parts."""
    from ..functions.segmentation import set_overlap

    return set_overlap(_order_members(sf_dir), min_overlap=2)


SET_OVERLAP_SQL = """
WITH mem AS (SELECT DISTINCT l_orderkey AS seg, l_partkey AS v FROM lineitem)
SELECT a.seg AS src, b.seg AS dst, COUNT(*) AS overlap
FROM mem a JOIN mem b ON a.v = b.v AND a.seg < b.seg
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


def q_set_overlap_for_cc(sf_dir: str):
    """SetOverlapForCC.scala:28-145 — CC-preserving sparse overlap edges
    between orders sharing ≥2 parts.  The emitted edge SUBSET is
    implementation-defined (only its components are guaranteed), so the
    query returns the component labels — deterministic and equal to CC
    over the FULL overlap graph, which the SQL oracle computes directly."""
    import pyarrow as pa

    from ..functions.graph import Graph, connected_components
    from ..functions.segmentation import set_overlap_for_cc

    edges = set_overlap_for_cc(_order_members(sf_dir), min_overlap=2)
    g = Graph.from_edges(edges.materialize())
    labels = connected_components(g)
    return pa.table({"id": g.vids, "component": labels})


SET_OVERLAP_CC_SQL = """
WITH RECURSIVE mem AS (
  SELECT DISTINCT l_orderkey AS seg, l_partkey AS v FROM lineitem
),
ov AS (
  SELECT a.seg AS src, b.seg AS dst
  FROM mem a JOIN mem b ON a.v = b.v AND a.seg < b.seg
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
sym AS (SELECT src, dst FROM ov UNION SELECT dst AS src, src AS dst FROM ov),
verts AS (SELECT DISTINCT src AS id FROM sym),
reach(id, label) AS (
  SELECT id, id FROM verts
  UNION
  SELECT e.dst, r.label
  FROM reach r JOIN sym e ON e.src = r.id
  WHERE r.label < e.dst
)
SELECT id, MIN(label) AS component FROM reach GROUP BY id
"""


def q_check_cliques(sf_dir: str):
    """CheckClique.scala:28 — are each order's parts a clique in the
    directed precedence graph (either-direction connectivity)?"""
    from ..functions.segmentation import check_cliques
    from .structure import precedence_edges

    return check_cliques(_order_members(sf_dir), precedence_edges(sf_dir))


CHECK_CLIQUE_SQL = """
WITH prec AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey
   AND b.l_linenumber = a.l_linenumber + 1
   AND a.l_partkey != b.l_partkey
),
canon AS (
  SELECT DISTINCT LEAST(src, dst) AS x, GREATEST(src, dst) AS y FROM prec
),
mem AS (SELECT DISTINCT l_orderkey AS seg, l_partkey AS v FROM lineitem),
n AS (SELECT seg, COUNT(*) AS n FROM mem GROUP BY seg),
pairs AS (
  SELECT a.seg, a.v AS x, b.v AS y
  FROM mem a JOIN mem b ON a.seg = b.seg AND a.v < b.v
),
conn AS (
  SELECT p.seg, COUNT(*) AS c
  FROM pairs p JOIN canon e ON e.x = p.x AND e.y = p.y
  GROUP BY p.seg
)
SELECT n.seg AS segment,
       COALESCE(conn.c, 0) = n.n * (n.n - 1) / 2 AS is_clique
FROM n LEFT JOIN conn ON conn.seg = n.seg
"""


def q_segment_quality(sf_dir: str):
    """SegmentationAttributeOperations.scala:66-76 family — per-brand
    quality metrics of the brand segmentation over the co-purchase graph
    (coverage, density, expansion, conductance, hub dominance)."""
    from ..functions.segmentation import segment_quality
    from .copurchase import copurchase_edges

    return segment_quality(copurchase_edges(sf_dir), _brand_belongs(sf_dir))


SEGMENT_QUALITY_SQL = """
WITH edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
m AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS m FROM edges),
labeled AS MATERIALIZED (
  SELECT e.src, e.dst, pa.p_brand AS b_src, pb.p_brand AS b_dst
  FROM edges e
  JOIN part pa ON pa.p_partkey = e.src
  JOIN part pb ON pb.p_partkey = e.dst
),
sizes AS MATERIALIZED (
  SELECT p_brand AS segment, COUNT(*)::BIGINT AS size FROM part GROUP BY 1
),
internal AS MATERIALIZED (
  SELECT b_src AS segment, COUNT(*)::BIGINT AS internal_edges
  FROM labeled WHERE b_src = b_dst GROUP BY 1
),
cut AS MATERIALIZED (
  SELECT segment, COUNT(*)::BIGINT AS cut_edges FROM (
    SELECT b_src AS segment FROM labeled WHERE b_src != b_dst
    UNION ALL
    SELECT b_dst FROM labeled WHERE b_src != b_dst
  ) GROUP BY 1
),
intdeg AS MATERIALIZED (
  SELECT segment, v, COUNT(*)::BIGINT AS d FROM (
    SELECT b_src AS segment, src AS v FROM labeled WHERE b_src = b_dst
    UNION ALL
    SELECT b_dst, dst FROM labeled WHERE b_src = b_dst
  ) GROUP BY 1, 2
),
maxdeg AS MATERIALIZED (
  SELECT segment, MAX(d) AS max_int_deg FROM intdeg GROUP BY 1
)
SELECT s.segment,
       s.size,
       COALESCE(i.internal_edges, 0) AS internal_edges,
       COALESCE(c.cut_edges, 0) AS cut_edges,
       ROUND(COALESCE(i.internal_edges, 0) / (SELECT m FROM m), 6) AS coverage,
       ROUND(CASE WHEN s.size > 1
             THEN COALESCE(i.internal_edges, 0) / (s.size * (s.size - 1) / 2.0)
             ELSE 0 END, 6) AS density,
       ROUND(COALESCE(c.cut_edges, 0) / s.size::DOUBLE, 6) AS expansion,
       ROUND(CASE WHEN LEAST(2.0 * COALESCE(i.internal_edges, 0) + COALESCE(c.cut_edges, 0),
                        2.0 * (SELECT m FROM m)
                        - (2.0 * COALESCE(i.internal_edges, 0) + COALESCE(c.cut_edges, 0))) > 0
             THEN COALESCE(c.cut_edges, 0)
                  / LEAST(2.0 * COALESCE(i.internal_edges, 0) + COALESCE(c.cut_edges, 0),
                          2.0 * (SELECT m FROM m)
                          - (2.0 * COALESCE(i.internal_edges, 0) + COALESCE(c.cut_edges, 0)))
             ELSE 0 END, 6) AS conductance,
       ROUND(CASE WHEN s.size > 1
             THEN COALESCE(d.max_int_deg, 0) / (s.size - 1.0) ELSE 0 END, 6)
           AS hub_dominance
FROM sizes s
LEFT JOIN internal i ON i.segment = s.segment
LEFT JOIN cut c ON c.segment = s.segment
LEFT JOIN maxdeg d ON d.segment = s.segment
ORDER BY s.segment
"""


def q_infocom_communities(sf_dir: str):
    """Find infocom communities over the precedence graph
    (BuildSegmentationOperations.scala:136-199: max cliques → Infocom
    clique-overlap edges → CC → vertex-to-community) — rows-only
    (clique enumeration is not SQL-expressible; pytest pins planted
    overlapping/disjoint clique structure)."""
    from ..functions.segmentation import infocom_communities
    from .structure import precedence_edges

    return infocom_communities(
        precedence_edges(sf_dir), min_clique_size=3, adjacency_threshold=0.6
    )


def q_segment_stability(sf_dir: str):
    """Per-brand stability (SegmentationAttributeOperations.scala:62-65;
    NetworKit StablePartitionNodes) of the brand segmentation over the
    co-purchase graph."""
    from ..functions.segmentation import segment_stability
    from .copurchase import copurchase_edges

    return segment_stability(copurchase_edges(sf_dir), _brand_belongs(sf_dir))


SEGMENT_STABILITY_SQL = """
WITH edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
labeled AS MATERIALIZED (
  SELECT e.src, e.dst, pa.p_brand AS b_src, pb.p_brand AS b_dst
  FROM edges e
  JOIN part pa ON pa.p_partkey = e.src
  JOIN part pb ON pb.p_partkey = e.dst
),
nbr AS MATERIALIZED (
  SELECT u, own, nseg, COUNT(*)::BIGINT AS c FROM (
    SELECT src AS u, b_src AS own, b_dst AS nseg FROM labeled
    UNION ALL
    SELECT dst AS u, b_dst AS own, b_src AS nseg FROM labeled
  ) GROUP BY 1, 2, 3
),
pv AS MATERIALIZED (
  SELECT u, own AS segment,
         MAX(CASE WHEN own = nseg THEN c ELSE 0 END) AS own_c,
         MAX(CASE WHEN own <> nseg THEN c ELSE 0 END) AS other_max
  FROM nbr GROUP BY u, own
),
unstable AS MATERIALIZED (
  SELECT segment, COUNT(*)::BIGINT AS unstable
  FROM pv WHERE own_c < other_max GROUP BY segment
),
sizes AS MATERIALIZED (
  SELECT p_brand AS segment, COUNT(*)::BIGINT AS size FROM part GROUP BY 1
)
SELECT s.segment, s.size,
       (s.size - COALESCE(u.unstable, 0))::BIGINT AS stable_nodes,
       ROUND((s.size - COALESCE(u.unstable, 0))::DOUBLE / s.size, 6) AS stability
FROM sizes s LEFT JOIN unstable u ON u.segment = s.segment
ORDER BY s.segment
"""


def q_segment_fragmentation(sf_dir: str):
    """Per-brand fragmentation (SegmentationAttributeOperations.scala:86;
    NetworKit PartitionFragmentation): 1 − largest intra-brand component /
    brand size."""
    from ..functions.segmentation import segment_fragmentation
    from .copurchase import copurchase_edges

    return segment_fragmentation(copurchase_edges(sf_dir), _brand_belongs(sf_dir))


SEGMENT_FRAGMENTATION_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
labeled AS (
  SELECT e.src, e.dst
  FROM edges e
  JOIN part pa ON pa.p_partkey = e.src
  JOIN part pb ON pb.p_partkey = e.dst
  WHERE pa.p_brand = pb.p_brand
),
isym AS (SELECT src, dst FROM labeled UNION SELECT dst, src FROM labeled),
reach(id, label) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION
  SELECT e.dst, r.label FROM reach r JOIN isym e ON e.src = r.id
  WHERE r.label < e.dst
),
comp AS (SELECT id, MIN(label) AS comp FROM reach GROUP BY id),
percomp AS (
  SELECT p.p_brand AS segment, c.comp, COUNT(*)::BIGINT AS n
  FROM comp c JOIN part p ON p.p_partkey = c.id
  GROUP BY 1, 2
),
largest AS (
  SELECT segment, MAX(n)::BIGINT AS largest_component FROM percomp GROUP BY segment
),
sizes AS (
  SELECT p_brand AS segment, COUNT(*)::BIGINT AS size FROM part GROUP BY 1
)
SELECT s.segment, s.size, l.largest_component,
       ROUND(1.0 - l.largest_component::DOUBLE / s.size, 6) AS fragmentation
FROM sizes s JOIN largest l ON l.segment = s.segment
ORDER BY s.segment
"""


def q_segmentation_scalars(sf_dir: str):
    """Whole-segmentation coverage + edge cut of the brand segmentation
    (SegmentationAttributeOperations.scala:92-103; NetworKit Coverage /
    EdgeCut) — one row."""
    from ..functions.segmentation import segmentation_scalars
    from .copurchase import copurchase_edges

    return segmentation_scalars(copurchase_edges(sf_dir), _brand_belongs(sf_dir))


SEGMENTATION_SCALARS_SQL = """
WITH edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
flags AS MATERIALIZED (
  SELECT CASE WHEN pa.p_brand = pb.p_brand THEN 1 ELSE 0 END AS intra
  FROM edges e
  JOIN part pa ON pa.p_partkey = e.src
  JOIN part pb ON pb.p_partkey = e.dst
)
SELECT ROUND(SUM(intra)::DOUBLE / COUNT(*), 6) AS coverage,
       (COUNT(*) - SUM(intra))::BIGINT AS edge_cut
FROM flags
"""
