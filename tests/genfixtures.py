"""Deterministic graph fixtures (FIXTURES.md §2). Pure numpy, seed=42.

Each generator returns a list of *undirected* (u, v, w) triples, each
unordered pair listed once.  Use `directed(...)`/`to_spark` helpers to
feed engines that expect directed pair lists.
"""

from __future__ import annotations

import numpy as np


def clique(nodes, w=1.0):
    nodes = list(nodes)
    return [
        (nodes[i], nodes[j], w)
        for i in range(len(nodes))
        for j in range(i + 1, len(nodes))
    ]


def g_two_cliques(bridge_w=1.0):
    return clique(range(6)) + clique(range(6, 12)) + [(5, 6, bridge_w)]


def g_ring_cliques_4():
    e = []
    for b in range(4):
        e += clique(range(6 * b, 6 * b + 6))
    e += [(5, 6, 1.0), (11, 12, 1.0), (17, 18, 1.0), (23, 0, 1.0)]
    return e


def g_barbell():
    return clique(range(5)) + [(4, 5, 1.0), (5, 6, 1.0)] + clique(range(6, 11))


def g_disjoint():
    # K4 {0..3} ⊔ C5 {4..8} ⊔ isolated {9} (isolated shows up only via
    # vertex tables built from edges — engines see edge lists, so node 9
    # is checked separately where it matters)
    c5 = [(4, 5, 1.0), (5, 6, 1.0), (6, 7, 1.0), (7, 8, 1.0), (8, 4, 1.0)]
    return clique(range(4)) + c5


def g_star_hub(n_leaves=1000):
    return [(0, i, 1.0) for i in range(1, n_leaves + 1)]


def g_chain_dangling():
    """Directed path 0→1→2→3→4 (returned as directed triples)."""
    return [(i, i + 1, 1.0) for i in range(4)]


def g_cycle_n(n=10):
    """Directed cycle (directed triples)."""
    return [(i, (i + 1) % n, 1.0) for i in range(n)]


def g_kn(n=7):
    return clique(range(n))


def g_weighted_pair():
    return g_two_cliques(bridge_w=100.0)


def g_powerlaw(n=1000, m_target=5000, seed=42, hub_frac=0.01):
    """Chung–Lu-ish power-law graph with one planted hub (FIXTURES §2).
    Deterministic; returns undirected triples, deduped, no self-loops."""
    rng = np.random.Generator(np.random.PCG64(seed))
    w = (np.arange(1, n + 1, dtype=np.float64)) ** (-0.7)
    p = w / w.sum()
    src = rng.choice(n, size=3 * m_target, p=p)
    dst = rng.choice(n, size=3 * m_target, p=p)
    mask = src != dst
    src, dst = src[mask], dst[mask]
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    pairs = np.unique(lo.astype(np.int64) * n + hi)[:m_target]
    edges = [(int(k // n), int(k % n), 1.0) for k in pairs]
    # planted hub: node 0 wired to hub_frac of all nodes
    hub_targets = rng.choice(np.arange(1, n), size=max(1, int(hub_frac * n)), replace=False)
    seen = {(u, v) for u, v, _ in edges}
    for t in hub_targets:
        key = (0, int(t)) if 0 < t else (int(t), 0)
        if key not in seen:
            edges.append((key[0], key[1], 1.0))
            seen.add(key)
    return edges


def g_powerlaw_arrays(n, m_target, seed=42, hub_frac=0.01):
    """Large-scale vectorized Chung–Lu generator (inverse-CDF sampling,
    no Python loops): returns (src, dst, weight) numpy arrays of
    distinct undirected pairs (src<dst per degree order… src<dst by id)
    with a planted hub at node 0.  Used by BENCH at 10^6–10^8 edges."""
    rng = np.random.Generator(np.random.PCG64(seed))
    w = (np.arange(1, n + 1, dtype=np.float64)) ** (-0.7)
    cdf = np.cumsum(w / w.sum())

    def pick(k):
        return np.searchsorted(cdf, rng.random(k), side="right").astype(np.int64)

    src = pick(3 * m_target)
    dst = pick(3 * m_target)
    mask = src != dst
    lo = np.minimum(src[mask], dst[mask])
    hi = np.maximum(src[mask], dst[mask])
    key = np.unique(lo * n + hi)[:m_target]
    hub_targets = rng.choice(
        np.arange(1, n, dtype=np.int64),
        size=max(1, int(hub_frac * n)),
        replace=False,
    )
    # hub pairs (0, t) have key = t < n — cannot collide with lo>0 keys
    key = np.unique(np.concatenate([key, hub_targets]))
    return key // n, key % n, np.ones(key.size, dtype=np.float64)


def directed(und_triples):
    """Both directions of an undirected triple list."""
    out = []
    for u, v, w in und_triples:
        out.append((u, v, w))
        out.append((v, u, w))
    return out


def gnp(n, p, seed):
    """Seeded G(n,p) undirected graph for property-based tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    e = []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                e.append((i, j, 1.0))
    return e
