"""Spark-level SLM tests: exact mode vs golden partitions & oracle,
scale mode Q-parity class, Louvain variant (SURVEY.md §6.2-1/2)."""

import numpy as np
import pytest

from slmpy_spark import engine
from tests import genfixtures as G
from tests import oracle_slm as O
from tests.conftest import edges_df


def canon_df(assign_df):
    rows = assign_df.collect()
    groups = {}
    for r in rows:
        groups.setdefault(r.community, []).append(r.id)
    return sorted(tuple(sorted(g)) for g in groups.values())


def test_slm_exact_two_cliques(spark):
    assign, q = engine.slm(edges_df(spark, G.g_two_cliques()), seed=42, mode="exact")
    assert canon_df(assign) == [tuple(range(6)), tuple(range(6, 12))]
    oq = O.modularity_oracle(
        G.g_two_cliques(), {i: (0 if i < 6 else 1) for i in range(12)}
    )
    assert q == pytest.approx(oq, abs=1e-9)
    # engine-side Q recomputation agrees with the kernel-reported Q
    q2 = engine.modularity(edges_df(spark, G.g_two_cliques()), assign)
    assert q2 == pytest.approx(q, abs=1e-9)


def test_slm_exact_ring_cliques(spark):
    assign, q = engine.slm(
        edges_df(spark, G.g_ring_cliques_4()), seed=42, mode="exact", n_random_starts=4
    )
    assert canon_df(assign) == [
        tuple(range(0, 6)),
        tuple(range(6, 12)),
        tuple(range(12, 18)),
        tuple(range(18, 24)),
    ]


def test_slm_exact_weighted_bridge(spark):
    assign, _ = engine.slm(edges_df(spark, G.g_weighted_pair()), seed=42, mode="exact")
    c = {r.id: r.community for r in assign.collect()}
    assert c[5] == c[6]


def test_slm_exact_deterministic(spark):
    e = edges_df(spark, G.gnp(40, 0.12, seed=8))
    a1, q1 = engine.slm(e, seed=7, mode="exact")
    a2, q2 = engine.slm(e, seed=7, mode="exact")
    assert q1 == q2
    assert canon_df(a1) == canon_df(a2)


def test_louvain_exact(spark):
    assign, q = engine.louvain(
        edges_df(spark, G.g_two_cliques()), seed=42, mode="exact"
    )
    assert canon_df(assign) == [tuple(range(6)), tuple(range(6, 12))]


def test_slm_scale_two_cliques_q_class(spark):
    """Scale mode must land in the same Q class as exact on graphs with
    a stable optimum (labels may differ in sequence, Q must match)."""
    e = edges_df(spark, G.g_two_cliques())
    assign, q = engine.slm(
        e, seed=42, mode="scale", n_parts=2, exact_threshold=0, max_sweeps=6
    )
    assert canon_df(assign) == [tuple(range(6)), tuple(range(6, 12))]
    oq = O.modularity_oracle(
        G.g_two_cliques(), {i: (0 if i < 6 else 1) for i in range(12)}
    )
    assert q == pytest.approx(oq, abs=1e-6)


def test_slm_scale_ring_cliques(spark):
    e = edges_df(spark, G.g_ring_cliques_4())
    assign, q = engine.slm(
        e, seed=42, mode="scale", n_parts=3, exact_threshold=0, max_sweeps=8
    )
    _, oq = O.slm_oracle(G.g_ring_cliques_4(), seed=42)
    assert q == pytest.approx(oq, abs=1e-6)


def test_slm_scale_powerlaw_reasonable_q(spark):
    """On a power-law graph, scale-mode Q should be within a small gap
    of the sequential oracle's Q (heuristics, different visit orders)."""
    und = G.g_powerlaw(n=300, m_target=900, seed=42)
    e = edges_df(spark, und)
    # production path: distributed LM+split at level 0 (graph above the
    # exact threshold), exact kernel for the shrunken super-levels
    assign, q = engine.slm(
        e, seed=42, mode="scale", n_parts=4, exact_threshold=600, max_sweeps=8
    )
    _, oq = O.slm_oracle(und, seed=42)
    assert q >= oq - 0.03
    # every vertex assigned exactly once
    n_vertices = engine.vertices(e).count()
    assert assign.count() == n_vertices
    assert assign.select("id").distinct().count() == n_vertices


def test_louvain_refine_scale(spark):
    """G15 refinement in SCALE mode: the extra level-0 LM pass must keep
    Q in the oracle class (and can only improve it — guarded)."""
    und = G.g_ring_cliques_4()
    e = edges_df(spark, und)
    assign, q = engine.louvain(
        e, seed=42, mode="scale", exact_threshold=0, max_sweeps=8,
        variant="louvain_refine",
    )
    _, oq = O.slm_oracle(und, seed=42)
    assert q >= oq - 0.03
    n = engine.vertices(e).count()
    assert assign.count() == n


def test_slm_scale_planted_hub(spark):
    """SURVEY §6.2-6 hub-skew gate: a hub vertex wired into EVERY other
    vertex (degree = n, the 100 TB 'popular page' shape) must neither
    stall nor degrade the distributed sweep — its k_{i,c} rows are
    partially aggregated map-side (the engine-level salting), so no
    single task sees the full adjacency.  Q must stay in the
    sequential oracle's class and the result must be deterministic."""
    und = G.g_ring_cliques_4()
    hub = [(100, v, 1.0) for v in range(24)]
    e = edges_df(spark, und + hub)
    assign, q = engine.slm(e, seed=3, mode="scale", exact_threshold=0, max_sweeps=8)
    _, oq = O.slm_oracle(und + hub, seed=3)
    assert q >= oq - 0.03
    n_vertices = engine.vertices(e).count()
    assert assign.count() == n_vertices
    # deterministic rerun
    assign2, q2 = engine.slm(e, seed=3, mode="scale", exact_threshold=0, max_sweeps=8)
    assert q2 == pytest.approx(q, abs=1e-12)
    assert canon_df(assign2) == canon_df(assign)


def test_slm_auto_picks_exact_for_small(spark):
    assign, q = engine.slm(edges_df(spark, G.g_two_cliques()), seed=42, mode="auto")
    assert canon_df(assign) == [tuple(range(6)), tuple(range(6, 12))]
