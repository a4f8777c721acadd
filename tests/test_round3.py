"""Round-3 regression tests: real materialize unpersist + observe
fusion, weighted PageRank, batch link-extraction parity, scale-mode
random starts, clustered-corpus ANN recall, dedup cap signal."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from slmpy_spark import engine
from slmpy_spark.sources import extract
from slmpy_spark.textops import dedup, similarity
from slmpy_spark.util import materialize
from tests import genfixtures as G
from tests import oracle_slm as O
from tests.conftest import edges_df
from tests.test_textops import docs_df, emb_df


# ------------------------------------------------------- materialize


def _n_persistent_rdds(spark):
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_materialize_unpersist_frees_checkpoint_blocks(spark):
    """ADVICE r2: Dataset.unpersist on a localCheckpointed frame is a
    CacheManager no-op; materialize() must free the actual checkpoint
    RDD blocks."""
    before = _n_persistent_rdds(spark)
    m = materialize(spark.range(1000).select("id", (F.col("id") * 2).alias("v")))
    assert _n_persistent_rdds(spark) == before + 1
    assert m.count() == 1000
    m.unpersist()
    assert _n_persistent_rdds(spark) == before


def test_materialize_delivers_observe_metrics(spark):
    """The localCheckpoint inside materialize() is a tracked Dataset
    action — DataFrame.observe metrics attached below it must be
    delivered by the materialization itself (the 1-job-per-iteration
    fusion in slm/pagerank/cc/lpa depends on this)."""
    obs = Observation()
    df = spark.range(100).observe(obs, F.sum("id").alias("s"))
    m = materialize(df)
    assert obs.get["s"] == 4950
    assert m.count() == 100
    m.unpersist()


# -------------------------------------------------- weighted pagerank


def _weighted_directed(n=25, p=0.2, seed=3):
    und = G.gnp(n, p, seed=seed)
    d = G.directed(und)[: int(len(und) * 1.4)]
    # deterministic non-uniform weights so weighted != unweighted
    return [(u, v, float((u * 7 + v * 13) % 5 + 1)) for u, v, _ in d]


def test_pagerank_weighted_matches_numpy(spark):
    e = _weighted_directed()
    ranks = {
        r.id: r.rank
        for r in engine.pagerank(
            edges_df(spark, e), tol=1e-9, max_iter=200, weighted=True
        ).collect()
    }
    oracle = O.pagerank_oracle(e, weighted=True)
    assert set(ranks) == set(oracle)
    for k in oracle:
        assert ranks[k] == pytest.approx(oracle[k], abs=1e-6)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_weighted_differs_from_uniform(spark):
    e = _weighted_directed()
    rw = {
        r.id: r.rank
        for r in engine.pagerank(edges_df(spark, e), tol=1e-10, weighted=True).collect()
    }
    ru = {
        r.id: r.rank
        for r in engine.pagerank(edges_df(spark, e), tol=1e-10).collect()
    }
    assert max(abs(rw[k] - ru[k]) for k in rw) > 1e-4


# -------------------------------------- batch link-extraction parity


def test_extract_links_frame_parity_edge_cases():
    """ADVICE r2 (high): the batch path must emit the same multiset of
    (url, link) pairs as the frozen per-page extract_links — including
    empty hrefs (which used to become literal '.../nan' links), None
    html, and unquoted hrefs."""
    pages = [
        ("http://x.com/a", b'<a href="">empty</a><a href="/ok">ok</a>'),
        ("http://x.com/b", None),
        ("http://x.com/c", b"<a href=/bare>bare</a><a href=''>e2</a>"),
        ("http://x.com/d", b'<a href="http://y.com/z#f">z</a>'
                           b'<a href="http://y.com/z">z2</a>'),
        ("http://x.com/e", b"no links at all"),
    ]
    urls = pd.Series([u for u, _ in pages])
    htmls = pd.Series([h for _, h in pages])
    got = extract.extract_links_frame(urls, htmls)
    got_pairs = sorted(zip(got["url"], got["link"]))
    expected = sorted(
        (u, link)
        for u, h in pages
        for link in extract.extract_links(h if h is not None else b"", u)
    )
    assert got_pairs == expected
    assert all("nan" not in link for _, link in got_pairs)


def test_extract_text_series_parity_edge_cases():
    htmls = [None, b"", b"<p>a&amp;b</p>", b"x <script>y</script> z"]
    s = extract.extract_text_series(pd.Series(htmls))
    expected = [extract.extract_text(h if h is not None else b"") for h in htmls]
    assert list(s) == expected


# -------------------------------------------- scale-mode random starts


def test_slm_scale_random_starts_picks_best(spark):
    """G14 symmetry: n_random_starts=3 in scale mode returns the
    argmax-Q assignment over the three per-start seed offsets."""
    und = G.gnp(40, 0.12, seed=5) + G.g_two_cliques()
    e = edges_df(spark, und)
    kw = dict(mode="scale", exact_threshold=0, max_sweeps=4, max_levels=3)
    qs = []
    for start in range(3):
        _, q = engine.slm(e, seed=11 + 104_729 * start, **kw)
        qs.append(q)
    assign, q_multi = engine.slm(e, seed=11, n_random_starts=3, **kw)
    assert q_multi == pytest.approx(max(qs), abs=1e-12)
    # returned labels consistent with the reported q
    q_check = engine.modularity(e, assign)
    assert q_check == pytest.approx(q_multi, abs=1e-9)


# ------------------------------------------- ANN on clustered corpus


def test_ann_topk_recall_clustered_corpus(spark):
    """Non-isotropic corpus (tight clusters): single-table LSH can put
    a whole cluster on a hyperplane boundary; the banded multi-table
    default must still reach recall@10 ≥ 0.8."""
    rng = np.random.default_rng(23)
    n_clusters, per, dim = 10, 30, 16
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    vecs = np.concatenate(
        [
            # interleave clusters so queries 0..4 come from 5 clusters
            centers[np.arange(n_clusters * per) % n_clusters]
            + 0.15 * rng.normal(size=(n_clusters * per, dim))
        ]
    ).astype(np.float32)
    e = emb_df(spark, vecs).persist()
    exact = similarity.cosine_topk(e, k=10, n_queries=5).collect()
    ann = similarity.ann_topk(e, k=10, n_queries=5, corpus_n=len(vecs)).collect()
    hits = total = 0
    for q in range(5):
        truth = {r.vec_id for r in exact if r.query_id == q}
        got = {r.vec_id for r in ann if r.query_id == q}
        hits += len(truth & got)
        total += len(truth)
    assert total == 50
    assert hits / total >= 0.8, f"clustered recall {hits}/{total}"
    e.unpersist()


# ------------------------------------------------- dedup cap signal


def test_lsh_cap_signal_and_opt_out(spark):
    """No-silent-caps: the stats dict reports what max_bucket dropped;
    max_bucket=None disables the cap entirely."""
    docs = spark.createDataFrame(
        [(i, "the same text repeated here always") for i in range(50)],
        "doc_id long, text string",
    )
    stats: dict = {}
    out = dedup.lsh_candidates(
        docs, k=8, bands=4, shingle_n=1, max_bucket=10, stats=stats
    )
    assert out.count() == 0
    assert stats["dropped_buckets"] > 0
    assert stats["dropped_rows"] >= 50
    # opt-out: no cap → all pairs survive
    out2 = dedup.lsh_candidates(docs, k=8, bands=4, shingle_n=1, max_bucket=None)
    assert out2.count() == 50 * 49 // 2
    st2: dict = {}
    sh = dedup.simhash_candidates(docs, max_hamming=3, max_bucket=10, stats=st2)
    assert sh.count() == 0
    assert st2["dropped_buckets"] > 0
