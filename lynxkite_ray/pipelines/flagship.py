"""Flagship pipeline: Common-Crawl-shaped pages → link extraction →
deduplicated (src, dst) edge table → PageRank / components / LPA / triangles.

This is the BASELINE.json north-star path end-to-end:
read_parquet (column-pruned) → map_batches(LinkExtractor actor pool, html
dropped immediately after parse) → (src, dst) dedup shuffle → pinned CSR
shards → iterative gather-scatter with per-iteration checkpoints.
"""

from __future__ import annotations

import numpy as np

import ray.data as rd

from ..functions.graph import Graph, connected_components, pagerank
from ..sources.pages import pages_parquet
from ..stages.edges import links_to_edges, symmetrize
from ..stages.extract import extract_links


def build_edges(pages_ds, concurrency=None):
    """pages Dataset → deduplicated (src, dst) edge Dataset.
    Only url+html leave the read (column pruning happens at read_parquet in
    the callers)."""
    links = extract_links(pages_ds, concurrency=concurrency)
    return links_to_edges(links)


def flagship(
    pages_path: str | None = None,
    n_pages: int = 1000,
    seed: int = 42,
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint_root: str | None = None,
    with_components: bool = True,
):
    """Returns dict with the edge Dataset, the Graph handle, the rank vector
    (+ component labels), and summary scalars."""
    if pages_path is None:
        pages_path = pages_parquet(n_pages, seed)
    pages = rd.read_parquet(pages_path, columns=["url", "html"])
    # keep only the int64 id pair before materializing: the url string
    # columns are an order of magnitude heavier and nothing downstream
    # reads them
    links = extract_links(pages).select_columns(["src", "dst"]).materialize()
    edges = links_to_edges(links).materialize()
    # Pages with no out-links surface as sentinel rows (dst = -1); without
    # them a page with neither out- nor in-links would vanish from the
    # vertex set, skewing N and thus every PageRank value (every crawled
    # page is a vertex in the reference semantics, VerticesToEdges.scala:30).
    import ray

    @ray.remote
    def _sentinel_srcs(t):
        d = t.column("dst").to_numpy()
        return np.unique(t.column("src").to_numpy()[d == -1])

    parts = ray.get([_sentinel_srcs.remote(r) for r in links.to_arrow_refs()])
    parts = [p for p in parts if len(p)]
    extra = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    graph = Graph.from_edges(edges, extra_vertices=extra)
    ranks = pagerank(
        graph, damping=damping, iterations=iterations, checkpoint_root=checkpoint_root
    )
    out = {
        "edges": edges,
        "graph": graph,
        "ranks": ranks,
        "num_vertices": graph.num_vertices,
        "num_edges": graph.num_edges,
        "rank_sum": float(np.sum(ranks)),
    }
    if with_components:
        # connected_components treats stored edges as undirected, so the
        # PageRank graph is reused directly — no symmetrize pass needed
        out["components"] = connected_components(graph, checkpoint_root=checkpoint_root)
        out["num_components"] = int(len(np.unique(out["components"])))
    return out


def _sf_pages(sf_dir: str) -> int:
    """Deterministic page count per driver scale factor."""
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(tail)
    except ValueError:
        sf = 0.01
    return max(200, int(200_000 * sf))


def q_pages_flagship(sf_dir: str):
    """Rows-only driver query: full pages → extract → edges → PageRank
    (the pages graph is not expressible over the SQL views; correctness is
    pinned by the pytest differential suite instead)."""
    import pyarrow as pa

    res = flagship(n_pages=_sf_pages(sf_dir), with_components=False)
    from ..util import round_away

    return pa.table(
        {"id": res["graph"].vids, "rank": round_away(res["ranks"], 6)}
    )


def q_pages_extract_text(sf_dir: str):
    """Rows-only driver query: distributed text extraction (byte-identity
    with the pinned oracle is asserted in tests/test_extract.py)."""
    from ..stages.extract import extract_texts

    path = pages_parquet(_sf_pages(sf_dir), 42)
    pages = rd.read_parquet(path, columns=["url", "html"])
    return extract_texts(pages)

# ---------------------------------------------------------------- host graph
# Common-Crawl-style host-level contraction of the page link graph: the
# classic "host graph" job (page urls → registrable hosts, edge weight =
# number of page-level links).  The contraction is the scale move — hosts
# are orders of magnitude fewer than pages (10^7-10^8 vs 10^12), so the
# host graph's dense PageRank path stays driver-resident long after the
# page graph has crossed into Dataset mode.

_HOST_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?P<host>[^/?#]+)"


def _host_of(url_col):
    """Arrow-native host extraction (RE2 kernel, no Python per row)."""
    import pyarrow.compute as pc

    return pc.struct_field(pc.extract_regex(url_col, _HOST_PATTERN), "host")


def host_edges(links_ds):
    """links Dataset (src_url, dst_url, …) → weighted host edge table
    (src_host, dst_host, weight = number of DISTINCT page-level (src, dst)
    edges between the hosts — same dedup semantics as links_to_edges, so
    the weight is well-defined against the crawl regardless of how many
    times a page repeats a link).  Sentinel rows (dst_url = "", link-less
    pages) and unparseable urls are dropped: a host exists in the host
    graph iff at least one page-level link touches it.  One dedup shuffle
    on the url pair (per-block pre-dedup shrinks blocks first), then the per-batch Arrow
    regex + ONE hash aggregate — the contraction happens before any graph
    machinery sees the data."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.shuffle import distinct, grouped_aggregate

    def keep_links(t: pa.Table) -> pa.Table:
        return t.select(["src_url", "dst_url"]).filter(
            pc.not_equal(t["dst_url"], "")
        )

    pairs = distinct(
        links_ds.map_batches(keep_links, batch_format="pyarrow", zero_copy_batch=True),
        ["src_url", "dst_url"],
    )

    def to_hosts(t: pa.Table) -> pa.Table:
        sh = _host_of(t["src_url"])
        dh = _host_of(t["dst_url"])
        ok = pc.and_(sh.is_valid(), dh.is_valid())
        return pa.table({"src_host": sh, "dst_host": dh}).filter(ok)

    hosts = pairs.map_batches(to_hosts, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(
        hosts, ["src_host", "dst_host"], [("src_host", "count", "weight")]
    )


def host_graph_pagerank(sf_dir: str, iterations: int = 10):
    """Host-level weighted PageRank over the synthetic crawl: contract the
    page link graph to hosts, run weighted PR (per-src weight
    normalization), join host names back via the distinct host dim — no
    driver-side name dict, the id→name mapping stays a Dataset."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ids import hash64_array
    from ..stages.join import hash_join
    from ..stages.shuffle import distinct
    from ..util import round_away

    n = _sf_pages(sf_dir)
    path = pages_parquet(n, 42)
    pages = rd.read_parquet(path, columns=["url", "html"])
    links = extract_links(pages)
    he = host_edges(links).materialize()

    def with_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(hash64_array(t.column("src_host").to_pylist())),
                "dst": pa.array(hash64_array(t.column("dst_host").to_pylist())),
                "weight": pc.cast(t["weight"], pa.float64()),
            }
        )

    eids = he.map_batches(with_ids, batch_format="pyarrow", zero_copy_batch=True)
    g = Graph.from_edges(eids, weight_col="weight")
    ranks = pagerank(g, damping=0.85, iterations=iterations)

    def dim_block(t: pa.Table) -> pa.Table:
        hs = pa.concat_arrays(
            [
                t.column("src_host").combine_chunks().cast(pa.string()),
                t.column("dst_host").combine_chunks().cast(pa.string()),
            ]
        )
        u = pc.unique(hs)
        return pa.table(
            {"host_id": pa.array(hash64_array(u.to_pylist())), "host": u}
        )

    dim = distinct(
        he.map_batches(dim_block, batch_format="pyarrow", zero_copy_batch=True),
        ["host_id", "host"],
    )
    rank_ds = rd.from_arrow(
        pa.table({"host_id": g.vids, "host_rank": round_away(ranks, 6)})
    )
    return hash_join(rank_ds, dim, on="host_id").select_columns(
        ["host", "host_rank"]
    )


def q_host_graph_pagerank(sf_dir: str):
    """Rows-only driver query (pages are synthesized, not SQL views);
    pytest pins the contraction against a pure-python host-graph oracle."""
    return host_graph_pagerank(sf_dir)
