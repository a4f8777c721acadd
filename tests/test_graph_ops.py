"""Spark-level operator tests: degrees/symmetrize, PageRank, CC, LPA,
triangles, modularity — vs closed forms and numpy oracles
(SURVEY.md §6.2-3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from slmpy_spark import engine
from tests import genfixtures as G
from tests import oracle_slm as O
from tests.conftest import edges_df


def und_df(spark, und):
    # undirected fixtures are fed one direction; engine ops symmetrize
    return edges_df(spark, und)


# ----------------------------------------------------------- edges


def test_symmetrize_sums_reciprocal(spark):
    e = edges_df(spark, [(0, 1, 2.0), (1, 0, 3.0), (1, 2, 1.0)])
    sym = engine.symmetrize(e).orderBy("src", "dst").collect()
    assert [(r.src, r.dst, r.weight) for r in sym] == [
        (0, 1, 5.0),
        (1, 0, 5.0),
        (1, 2, 1.0),
        (2, 1, 1.0),
    ]


def test_degrees_and_total_weight(spark):
    sym = engine.symmetrize(und_df(spark, G.g_kn(5)))
    deg = {r.id: r.w_deg for r in engine.degrees(sym).collect()}
    assert deg == {i: 4.0 for i in range(5)}
    assert engine.total_weight(sym) == pytest.approx(2 * 10.0)


def test_normalize_edges_drops_self_loops_and_dedups(spark):
    e = edges_df(spark, [(0, 0, 1.0), (0, 1, 1.0), (0, 1, 2.0)])
    out = engine.normalize_edges(e).collect()
    assert [(r.src, r.dst, r.weight) for r in out] == [(0, 1, 3.0)]


# --------------------------------------------------------- pagerank


def test_pagerank_cycle_uniform(spark):
    n = 10
    e = edges_df(spark, G.g_cycle_n(n))
    ranks = {r.id: r.rank for r in engine.pagerank(e, tol=1e-10).collect()}
    for v in ranks.values():
        assert v == pytest.approx(1.0 / n, abs=1e-8)


def test_pagerank_dangling_matches_numpy(spark):
    e = G.g_chain_dangling()
    ranks = {
        r.id: r.rank
        for r in engine.pagerank(edges_df(spark, e), tol=1e-10, max_iter=100).collect()
    }
    oracle = O.pagerank_oracle(e)
    assert set(ranks) == set(oracle)
    for k in oracle:
        assert ranks[k] == pytest.approx(oracle[k], abs=1e-6)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_star_hub(spark):
    e = G.g_star_hub(50)  # undirected star → both directions
    d = G.directed(e)
    ranks = {
        r.id: r.rank
        for r in engine.pagerank(edges_df(spark, d), tol=1e-9, max_iter=200).collect()
    }
    oracle = O.pagerank_oracle(d)
    for k in oracle:
        assert ranks[k] == pytest.approx(oracle[k], abs=1e-6)
    assert ranks[0] == max(ranks.values())


def test_pagerank_random_graph_vs_numpy(spark):
    und = G.gnp(30, 0.15, seed=9)
    d = G.directed(und)[: int(len(und) * 1.3)]  # make it properly directed
    ranks = {
        r.id: r.rank
        for r in engine.pagerank(edges_df(spark, d), tol=1e-9, max_iter=200).collect()
    }
    oracle = O.pagerank_oracle(d)
    for k in oracle:
        assert ranks[k] == pytest.approx(oracle[k], abs=1e-6)


# --------------------------------------------------------------- cc


def test_cc_disjoint(spark):
    e = und_df(spark, G.g_disjoint())
    comps = {r.id: r.component for r in engine.connected_components(e).collect()}
    assert len({comps[i] for i in range(4)}) == 1
    assert len({comps[i] for i in range(4, 9)}) == 1
    assert comps[0] != comps[4]
    assert comps[0] == 0 and comps[4] == 4  # min-id labels


def test_cc_long_path(spark):
    # worst case for propagation: path graph needs O(log n) rounds
    n = 64
    e = edges_df(spark, G.directed([(i, i + 1, 1.0) for i in range(n - 1)]))
    comps = {r.id: r.component for r in engine.connected_components(e).collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == n


def test_cc_two_cliques_bridge(spark):
    comps = engine.connected_components(und_df(spark, G.g_two_cliques()))
    assert comps.select("component").distinct().count() == 1


# -------------------------------------------------------------- lpa


def test_lpa_two_cliques(spark):
    e = und_df(spark, G.g_two_cliques())
    labels = {r.id: r.label for r in engine.label_propagation(e, max_iter=10).collect()}
    assert len({labels[i] for i in range(6)}) == 1
    assert len({labels[i] for i in range(6, 12)}) == 1


def test_lpa_star_converges(spark):
    e = und_df(spark, G.g_star_hub(30))
    labels = engine.label_propagation(e, max_iter=5).collect()
    assert len(labels) == 31


# --------------------------------------------------------- triangles


def test_triangles_counts(spark):
    cases = [
        (G.g_kn(7), 35),
        (G.g_two_cliques(), 40),
        (G.g_ring_cliques_4(), 80),
        (G.g_disjoint(), 4),
        (G.g_star_hub(40), 0),
    ]
    for und, expected in cases:
        total, _ = engine.triangle_count(und_df(spark, und))
        assert total == expected, und[:3]


def test_triangles_per_vertex_k4(spark):
    total, pv = engine.triangle_count(und_df(spark, G.g_kn(4)))
    assert total == 4
    assert {r.id: r.triangles for r in pv.collect()} == {i: 3 for i in range(4)}


# -------------------------------------------------------- modularity


def test_modularity_matches_oracle(spark):
    und = G.g_two_cliques()
    assign_perfect = {i: 0 if i < 6 else 1 for i in range(12)}
    adf = spark.createDataFrame(
        [(k, v) for k, v in assign_perfect.items()], "id long, community long"
    )
    q = engine.modularity(und_df(spark, und), adf)
    assert q == pytest.approx(O.modularity_oracle(und, assign_perfect), abs=1e-12)


def test_modularity_singletons_random_graph(spark):
    und = G.gnp(25, 0.2, seed=4)
    assign = {i: i for i in range(25)}
    adf = spark.createDataFrame(list(assign.items()), "id long, community long")
    q = engine.modularity(und_df(spark, und), adf)
    assert q == pytest.approx(O.modularity_oracle(und, assign), abs=1e-12)
