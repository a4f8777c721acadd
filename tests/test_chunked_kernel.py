"""local_moving_chunked (the vectorized big-community kernel) vs the
sequential reference kernel: same Q class, valid partitions."""

import numpy as np
import pytest

from slmpy_spark.graph import kernels
from tests import genfixtures as G


def csr_of(und, n=None):
    d = G.directed(und)
    src = np.array([e[0] for e in d], dtype=np.int64)
    dst = np.array([e[1] for e in d], dtype=np.int64)
    w = np.array([e[2] for e in d], dtype=np.float64)
    n = n or int(max(src.max(), dst.max())) + 1
    indptr, nbr, ww = kernels.build_csr(n, src, dst, w)
    node_w = np.zeros(n)
    np.add.at(node_w, src, w)
    return n, indptr, nbr, ww, node_w


def run_both(und, seed=42, n=None):
    n, indptr, nbr, ww, node_w = csr_of(und, n)
    two_m = ww.sum()
    res2 = 1.0 / two_m
    cl_seq = np.arange(n, dtype=np.int64)
    kernels.local_moving(
        indptr, nbr, ww, node_w, cl_seq,
        res2, np.random.Generator(np.random.PCG64(seed)),
    )
    cl_chunk = np.arange(n, dtype=np.int64)
    kernels.local_moving_chunked(
        indptr, nbr, ww, node_w, cl_chunk,
        res2, np.random.Generator(np.random.PCG64(seed)),
    )
    q_seq = kernels.quality_numpy(indptr, nbr, ww, node_w, cl_seq)
    q_chunk = kernels.quality_numpy(indptr, nbr, ww, node_w, cl_chunk)
    return cl_seq, q_seq, cl_chunk, q_chunk


def canon(labels):
    groups = {}
    for i, c in enumerate(labels):
        groups.setdefault(c, []).append(i)
    return sorted(tuple(sorted(g)) for g in groups.values())


def test_chunked_two_cliques_exact_partition():
    _, q_seq, cl, q_chunk = run_both(G.g_two_cliques())
    assert canon(cl) == [tuple(range(6)), tuple(range(6, 12))]
    assert q_chunk == pytest.approx(q_seq, abs=1e-12)


def test_chunked_ring_cliques():
    _, q_seq, cl, q_chunk = run_both(G.g_ring_cliques_4())
    assert canon(cl) == [
        tuple(range(0, 6)), tuple(range(6, 12)),
        tuple(range(12, 18)), tuple(range(18, 24)),
    ]


def test_chunked_q_close_on_random_graphs():
    for seed in (0, 1, 2):
        und = G.gnp(120, 0.06, seed=seed)
        _, q_seq, _, q_chunk = run_both(und, seed=seed, n=120)
        assert q_chunk >= q_seq - 0.05


def test_chunked_powerlaw_large():
    # big enough to exercise multi-chunk rounds (the distributed split
    # path for hub communities)
    und = G.g_powerlaw(n=2000, m_target=8000, seed=42)
    _, q_seq, cl, q_chunk = run_both(und, seed=42)
    assert q_chunk >= q_seq - 0.05
    # labels are a valid partition (dense 0..k-1 after compactify)
    assert cl.min() == 0
    assert set(np.unique(cl)) == set(range(int(cl.max()) + 1))


def test_chunked_weight_sensitivity():
    _, _, cl, _ = run_both(G.g_weighted_pair())
    assert cl[5] == cl[6]  # heavy bridge merges its endpoints
