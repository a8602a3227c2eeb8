"""Single-process reference oracles — deliberately naive dict/set
implementations, independent of the engine's numpy/Ray code paths, used for
differential testing (SURVEY §5 rebuild test plan)."""

from collections import defaultdict


def pagerank_oracle(edges, vertices, damping=0.85, iterations=5):
    """edges: [(src, dst, w)]; reference semantics PageRank.scala:35-91."""
    vertices = list(vertices)
    N = len(vertices)
    wsum = defaultdict(float)
    for s, d, w in edges:
        if w > 0:
            wsum[s] += w
    pr = {v: 1.0 for v in vertices}
    for _ in range(iterations):
        incoming = defaultdict(float)
        for s, d, w in edges:
            if w > 0:
                incoming[d] += damping * pr[s] * (w / wsum[s])
        total = sum(incoming.values())
        uniform = (N - total) / N
        pr = {v: uniform + incoming.get(v, 0.0) for v in vertices}
    return pr


def components_oracle(edges, vertices):
    """Undirected connected components; label = min vertex id."""
    adj = defaultdict(set)
    for s, d, *_ in edges:
        adj[s].add(d)
        adj[d].add(s)
    label = {}
    for v in sorted(vertices):
        if v in label:
            continue
        stack, comp = [v], []
        seen = {v}
        while stack:
            u = stack.pop()
            comp.append(u)
            for n in adj[u]:
                if n not in seen:
                    seen.add(n)
                    stack.append(n)
        m = min(comp)
        for u in comp:
            label[u] = m
    return label


def lpa_oracle(edges, vertices, iterations=5):
    """Synchronous weighted LPA, undirected, tie-break = min label.
    edges: [(src, dst, w)] — treated as undirected (each edge contributes
    weight w in both directions)."""
    label = {v: v for v in vertices}
    nbrs = defaultdict(list)
    for s, d, w in edges:
        nbrs[s].append((d, w))
        nbrs[d].append((s, w))
    for _ in range(iterations):
        nxt = {}
        for v in vertices:
            if not nbrs[v]:
                nxt[v] = label[v]
                continue
            score = defaultdict(float)
            for n, w in nbrs[v]:
                score[label[n]] += w
            best = max(score.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        if nxt == label:
            label = nxt
            break
        label = nxt
    return label


def triangles_oracle(edges):
    """Exact triangle count of the simple undirected graph: loops dropped,
    parallel edges collapsed."""
    und = set()
    for s, d, *_ in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    count = 0
    for a, b in und:
        count += len(adj[a] & adj[b])
    return count // 3  # each triangle counted once per edge


def scc_oracle(edges, vertices):
    """Kosaraju two-pass DFS (dict/set, iterative); label = min id."""
    fwd = defaultdict(list)
    rev = defaultdict(list)
    for s, d, *_ in edges:
        if s != d:
            fwd[s].append(d)
            rev[d].append(s)
    seen = set()
    order = []
    for v in vertices:
        if v in seen:
            continue
        stack = [(v, iter(fwd[v]))]
        seen.add(v)
        while stack:
            u, it = stack[-1]
            pushed = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd[w])))
                    pushed = True
                    break
            if not pushed:
                order.append(u)
                stack.pop()
    label = {}
    for v in reversed(order):
        if v in label:
            continue
        comp = [v]
        label[v] = v
        stack = [v]
        while stack:
            u = stack.pop()
            for w in rev[u]:
                if w not in label:
                    label[w] = v
                    comp.append(w)
                    stack.append(w)
        m = min(comp)
        for u in comp:
            label[u] = m
    return label
