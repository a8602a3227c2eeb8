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
