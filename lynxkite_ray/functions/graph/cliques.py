"""FindMaxCliques.scala:16 analog — enumerate maximal cliques of size ≥
min_clique_size over the undirected simple graph.

Deterministic Bron–Kerbosch with greatest-degree pivoting and ascending-id
candidate order; cliques are emitted sorted by their member tuple so
clique ids (ordinals) are stable across runs.  Local-gather design with
the LOCAL_EDGE_THRESHOLD gate (the reference runs this via Sphynx on a
single node too)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ...context import LOCAL_EDGE_THRESHOLD
from ...stages.edges import canonical_edges
from .triangles import _gather_canonical


def _bron_kerbosch(adj: dict[int, set], min_size: int) -> list[tuple]:
    out: list[tuple] = []

    def expand(R: list, P: set, X: set):
        if not P and not X:
            if len(R) >= min_size:
                out.append(tuple(sorted(R)))
            return
        # pivot: vertex of P ∪ X with most neighbors in P (ties → min id)
        pivot = max(sorted(P | X), key=lambda u: len(adj[u] & P))
        for v in sorted(P - adj[pivot]):
            expand(R + [v], P & adj[v], X & adj[v])
            P.remove(v)
            X.add(v)

    expand([], set(adj), set())
    return sorted(out)


def find_max_cliques(edges: Dataset, min_clique_size: int = 3) -> Dataset:
    """(clique_id, member) — one row per clique membership; clique_id is
    the ordinal of the clique in sorted-member-tuple order."""
    import ray.data as rd

    canon = canonical_edges(edges).materialize()
    if canon.count() > LOCAL_EDGE_THRESHOLD:
        raise NotImplementedError(
            "find_max_cliques gathers the graph (single-node, reference "
            "parity with the Sphynx implementation); restrict the bundle "
            "first above LOCAL_EDGE_THRESHOLD"
        )
    s, d = _gather_canonical(canon)
    adj: dict[int, set] = {}
    for a, b in zip(s.tolist(), d.tolist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cliques = _bron_kerbosch(adj, min_clique_size)
    ids = []
    members = []
    for i, cl in enumerate(cliques):
        ids.extend([i] * len(cl))
        members.extend(cl)
    return rd.from_arrow(
        pa.table(
            {
                "clique_id": pa.array(ids, pa.int64()),
                "member": pa.array(members, pa.int64()),
            }
        )
    )
