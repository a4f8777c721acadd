"""Round-6 (optimization round) regressions.

Pins the r6 plan/shape changes:
- dedup verify stage is candidate-bounded, not shingle-quadratic
  (VERDICT r5 "What's wrong #2" / "do this #4");
- the fused LPA round (sentinel-row argmax, no join-back) matches the
  public lpa_round contract exactly;
- CC's stale-pointer jump still converges to min-reachable-id on a
  long chain (the halving case);
- pagerank's fused setup handles flat (no-in-edge) vertices exactly.
"""

import pytest
from pyspark.sql import functions as F

from slmpy_spark import engine
from slmpy_spark.textops import dedup

from tests.conftest import edges_df


def _hot_docs(spark, n_hot=40, n_pair=4):
    """A corpus where one trigram shingle is shared by `n_hot` docs
    (boilerplate), plus `n_pair` genuine near-duplicate pairs."""
    rows = []
    for i in range(n_hot):
        rows.append((i, f"common boiler plate unique{i} token{i} extra{i}"))
    base = 1000
    for j in range(n_pair):
        a, b = base + 2 * j, base + 2 * j + 1
        body = f"alpha{j} beta{j} gamma{j} delta{j} epsilon{j}"
        rows.append((a, body + f" enda{j}"))
        rows.append((b, body + f" endb{j}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_verify_candidate_bounded(spark):
    """Verify-mode intersection must be driven from the candidate
    pairs: its pre-aggregation input is |candidates| × shingles-per-doc
    even when one shingle is shared by B docs — the r5 layout's full
    shingle self-join emitted O(B²) rows for that shingle before the
    candidate semi-join could prune anything."""
    docs = _hot_docs(spark)
    sh = dedup._shingles(docs, 3).persist()
    cand = spark.createDataFrame(
        [(1000 + 2 * j, 1000 + 2 * j + 1) for j in range(4)], "a long, b long"
    )

    # result parity: candidate-driven verify == full pairs ∩ candidates
    got = sorted(
        tuple(r)
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.1, candidates=cand, shingles=sh
        ).collect()
    )
    full = dedup.ngram_jaccard_pairs(docs, threshold=0.1, shingles=sh)
    want = sorted(
        tuple(r) for r in full.join(cand, ["a", "b"], "left_semi").collect()
    )
    assert got == want and len(got) == 4

    # boundedness: the candidate-driven pre-agg input vs the quadratic
    # self-join the old layout paid (one hot shingle × 40 docs →
    # 780 a<b pairs from that shingle alone)
    bounded = cand.join(
        sh.select(F.col("doc_id").alias("a"), "shingle"), "a"
    ).count()
    l = sh.select(F.col("doc_id").alias("a"), "shingle")
    r = sh.select(F.col("doc_id").alias("b"), "shingle")
    quadratic = l.join(r, "shingle").where(F.col("a") < F.col("b")).count()
    max_sh = sh.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert bounded <= cand.count() * max_sh
    assert quadratic > 40 * 39 / 2  # the hot shingle alone is quadratic
    assert bounded * 10 < quadratic
    sh.unpersist()


def test_lpa_fused_round_matches_public_round(spark):
    """label_propagation(max_iter=1)'s fused sentinel-row round must
    equal the public lpa_round contract bit-for-bit (same argmax, same
    min-label tie-break, isolated vertices keep their label)."""
    from slmpy_spark.graph.labelprop import lpa_round

    edges = edges_df(
        spark,
        [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 3.0), (3, 4, 1.0), (0, 2, 1.0),
         (5, 6, 1.0), (7, 8, 4.0), (8, 9, 4.0)],
    )
    got = sorted(
        tuple(r) for r in engine.label_propagation(edges, max_iter=1).collect()
    )
    sym = engine.symmetrize(edges)
    verts = engine.vertices(edges)
    labels = verts.select("id", F.col("id").alias("label"))
    want = sorted(tuple(r) for r in lpa_round(sym, labels, verts).collect())
    assert got == want


def test_cc_chain_converges_to_min(spark):
    """A 64-node path graph: the stale-pointer jump must still contract
    chains (log-ish rounds) and land every vertex on component 0."""
    edges = edges_df(spark, [(i, i + 1, 1.0) for i in range(63)])
    out = engine.connected_components(edges).collect()
    assert len(out) == 64
    assert {r["component"] for r in out} == {0}


def test_pagerank_flat_vertices_exact(spark):
    """Vertices with no in-edges stay on the closed-form rank and their
    outgoing mass arrives via the state-riding unit column: Σ rank = 1
    and parity with the dense numpy iteration."""
    import numpy as np

    # 0→1, 0→2, 1→2, 3→0 (3 has no in-edges; 2 is dangling)
    pairs = [(0, 1), (0, 2), (1, 2), (3, 0)]
    edges = edges_df(spark, [(s, d, 1.0) for s, d in pairs])
    ranks = {r["id"]: r["rank"] for r in engine.pagerank(
        edges, tol=0.0, max_iter=12).collect()}
    n, d = 4, 0.85
    r = np.full(n, 1.0 / n)
    out = {0: [1, 2], 1: [2], 3: [0]}
    for _ in range(12):
        nxt = np.zeros(n)
        dang = sum(r[v] for v in range(n) if v not in out)
        for u, vs in out.items():
            for v in vs:
                nxt[v] += r[u] / len(vs)
        r = (1 - d) / n + d * (nxt + dang / n)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    for v in range(n):
        assert ranks[v] == pytest.approx(r[v], abs=1e-9)
