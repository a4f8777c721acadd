"""Independent sequential SLM/Louvain oracle (SURVEY.md §6.2-1).

Deliberately a *different code path* from slmpy_spark.graph.kernels:
plain dict/list adjacency, explicit per-neighbor loops, no CSR, no
numpy vectorization — same pinned semantics (SURVEY §1.1–1.2).  Used to
cross-check the engine until /root/reference/ fixtures are readable.
"""

from __future__ import annotations

import numpy as np


def build_adj(und_edges):
    """undirected (u,v,w) triples → (adj dict u→{v: w}, node list)."""
    adj: dict[int, dict[int, float]] = {}
    for u, v, w in und_edges:
        adj.setdefault(u, {})[v] = adj.setdefault(u, {}).get(v, 0.0) + w
        adj.setdefault(v, {})[u] = adj.setdefault(v, {}).get(u, 0.0) + w
    return adj


def modularity_oracle(und_edges, assign: dict, gamma=1.0) -> float:
    adj = build_adj(und_edges)
    two_m = sum(w for nb in adj.values() for w in nb.values())
    if two_m == 0:
        return 0.0
    intra = 0.0
    tot: dict[int, float] = {}
    for u, nb in adj.items():
        k_u = sum(nb.values())
        tot[assign[u]] = tot.get(assign[u], 0.0) + k_u
        for v, w in nb.items():
            if assign[u] == assign[v]:
                intra += w
    return intra / two_m - gamma * sum((t / two_m) ** 2 for t in tot.values())


def cpm_oracle(und_edges, assign: dict, gamma=1.0) -> float:
    """Constant Potts Model quality, independent implementation:
    Q_CPM = (Σin − γ Σ_c n_c²) / 2m with Σin counting each undirected
    intra edge twice (directed-pair convention, like the engine)."""
    adj = build_adj(und_edges)
    two_m = sum(w for nb in adj.values() for w in nb.values())
    if two_m == 0:
        return 0.0
    intra = sum(
        w for u, nb in adj.items() for v, w in nb.items() if assign[u] == assign[v]
    )
    sizes: dict[int, int] = {}
    for u in adj:
        sizes[assign[u]] = sizes.get(assign[u], 0) + 1
    return (intra - gamma * sum(s * s for s in sizes.values())) / two_m


def _local_moving(adj, nodes, node_w, cluster, res2, rng):
    n = len(nodes)
    if n <= 1:
        return False
    cw: dict[int, float] = {}
    np_per: dict[int, int] = {}
    for u in nodes:
        cw[cluster[u]] = cw.get(cluster[u], 0.0) + node_w[u]
        np_per[cluster[u]] = np_per.get(cluster[u], 0) + 1
    # unused ids: we allot ids 0..n-1 (dense); LIFO stack ascending
    used = set(cluster[u] for u in nodes)
    unused = [c for c in range(n) if c not in used]

    order = [nodes[i] for i in rng.permutation(n)]
    stable = 0
    i = 0
    moved_any = False
    while stable < n:
        j = order[i]
        cj = cluster[j]
        cw[cj] -= node_w[j]
        np_per[cj] -= 1
        if np_per[cj] == 0:
            unused.append(cj)
        # gather k_{j,c}
        kic: dict[int, float] = {}
        for v, w in adj.get(j, {}).items():
            kic[cluster[v]] = kic.get(cluster[v], 0.0) + w
        best, best_gain = -1, 0.0
        for c in sorted(kic):
            gain = kic[c] - node_w[j] * cw.get(c, 0.0) * res2
            if gain > best_gain:
                best, best_gain = c, gain
        if best < 0:
            best = unused.pop()
        cw[best] = cw.get(best, 0.0) + node_w[j]
        np_per[best] = np_per.get(best, 0) + 1
        if best == cj:
            stable += 1
        else:
            cluster[j] = best
            stable = 1
            moved_any = True
        i = (i + 1) % n
    # compactify ascending
    remap = {}
    for c in sorted(set(cluster[u] for u in nodes)):
        remap[c] = len(remap)
    for u in nodes:
        cluster[u] = remap[cluster[u]]
    return moved_any


def _reduced(adj, nodes, node_w, cluster):
    """Aggregate to super-graph dict form."""
    r_edges: dict[tuple[int, int], float] = {}
    r_node_w: dict[int, float] = {}
    for u in nodes:
        cu = cluster[u]
        r_node_w[cu] = r_node_w.get(cu, 0.0) + node_w[u]
        for v, w in adj.get(u, {}).items():
            cv = cluster[v]
            if cu != cv:
                r_edges[(cu, cv)] = r_edges.get((cu, cv), 0.0) + w
    r_adj: dict[int, dict[int, float]] = {c: {} for c in r_node_w}
    for (cu, cv), w in r_edges.items():
        r_adj[cu][cv] = w
    return r_adj, r_node_w


def _slm(adj, nodes, node_w, cluster, res2, rng):
    n = len(nodes)
    if n == 1:
        return False
    update = _local_moving(adj, nodes, node_w, cluster, res2, rng)
    n_clusters = len(set(cluster[u] for u in nodes))
    if n_clusters >= n:
        return update
    # subnetworks, LM from singletons, new global subcluster ids
    members: dict[int, list[int]] = {}
    for u in sorted(nodes):
        members.setdefault(cluster[u], []).append(u)
    new_cluster: dict[int, int] = {}
    parents: list[int] = []
    next_id = 0
    for c in sorted(members):
        ms = members[c]
        mset = set(ms)
        sub_adj = {
            u: {v: w for v, w in adj.get(u, {}).items() if v in mset} for u in ms
        }
        sub_cl = {u: i for i, u in enumerate(ms)}
        _local_moving(sub_adj, ms, node_w, sub_cl, res2, rng)
        k = len(set(sub_cl.values()))
        for u in ms:
            new_cluster[u] = next_id + sub_cl[u]
        parents += [c] * k
        next_id += k
    for u in nodes:
        cluster[u] = new_cluster[u]
    r_adj, r_node_w = _reduced(adj, nodes, node_w, cluster)
    r_nodes = sorted(r_node_w)
    r_cluster = {i: parents[i] for i in r_nodes}
    update |= _slm(r_adj, r_nodes, r_node_w, r_cluster, res2, rng)
    for u in nodes:
        cluster[u] = r_cluster[cluster[u]]
    # compactify
    remap = {}
    for c in sorted(set(cluster[u] for u in nodes)):
        remap[c] = len(remap)
    for u in nodes:
        cluster[u] = remap[cluster[u]]
    return update


def slm_oracle(und_edges, gamma=1.0, seed=0, n_iterations=3, extra_nodes=()):
    """Run sequential SLM; returns (assign dict, q)."""
    adj = build_adj(und_edges)
    for u in extra_nodes:
        adj.setdefault(u, {})
    nodes = sorted(adj)
    node_w = {u: sum(adj[u].values()) for u in nodes}
    two_m = sum(node_w.values())
    res2 = gamma / two_m if two_m else 0.0
    rng = np.random.Generator(np.random.PCG64(seed))
    cluster = {u: i for i, u in enumerate(nodes)}
    for _ in range(n_iterations):
        if not _slm(adj, nodes, node_w, cluster, res2, rng):
            break
    return cluster, modularity_oracle(und_edges, cluster, gamma)


def pagerank_oracle(
    directed_edges, n_nodes=None, d=0.85, tol=1e-12, max_iter=500, weighted=False
):
    """Dense numpy power iteration with uniform dangling redistribution.
    Returns dict id→rank over vertices appearing in edges (or 0..n-1).
    `weighted=True`: contributions split by edge weight (w/out_w)
    instead of uniformly (1/out_deg)."""
    nodes = sorted({u for u, v, _ in directed_edges} | {v for u, v, _ in directed_edges})
    if n_nodes is not None:
        nodes = sorted(set(nodes) | set(range(n_nodes)))
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    out_w = np.zeros(n)
    for u, v, w in directed_edges:
        out_deg[idx[u]] += 1
        out_w[idx[u]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for u, v, w in directed_edges:
            if weighted:
                contrib[idx[v]] += r[idx[u]] * w / out_w[idx[u]]
            else:
                contrib[idx[v]] += r[idx[u]] / out_deg[idx[u]]
        dangling = r[out_deg == 0].sum()
        r_new = (1 - d) / n + d * (contrib + dangling / n)
        if np.abs(r_new - r).max() < tol:
            r = r_new
            break
        r = r_new
    return {u: float(r[idx[u]]) for u in nodes}
