"""The generated unrolled-CTE oracles (pagerank / label_propagation /
ann_topk / media_features in __spark_entry__.oracle_sql) validated
against independent numpy simulations of the pinned semantics — no
Spark needed, so the oracle side of the driver gate is regression-
tested even when the session fixture is unavailable.

The Spark side of the same equality is tests/test_entry.py (the full
driver-gate replication); this file catches oracle-SQL regressions
(rounding mode, CTE materialization, iteration-order mistakes) with a
second, engine-independent derivation of the expected values.
"""

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def edges(duck):
    """The prelude's deterministic documents→edges rule, fetched once."""
    return duck.execute(
        entrymod._SQL_PRELUDE + "SELECT src, dst, weight FROM edges"
    ).fetchall()


def _r6(x: float) -> float:
    """Spark F.round / DuckDB round(): HALF_UP on doubles (python's
    round() is banker's and disagrees on exact halves like 25/128)."""
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_pagerank_oracle_matches_numpy_power_iteration(duck, edges):
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    verts = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(verts)}
    n = len(verts)
    si = np.array([idx[int(s)] for s in src])
    di = np.array([idx[int(d)] for d in dst])
    od = np.bincount(si, minlength=n).astype(float)
    d = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        dmass = r[od == 0].sum()
        c = np.zeros(n)
        np.add.at(c, di, r[si] / od[si])
        r = (1 - d) / n + d * dmass / n + d * c
    got = dict(duck.execute(entrymod.oracle_sql()["pagerank"]).fetchall())
    assert set(got) == {int(v) for v in verts}
    assert abs(sum(got.values()) - 1.0) < 1e-4  # ranks sum to 1
    for v in verts:
        # _r6 (HALF_UP), not Python round() (banker's): the two disagree
        # on exact .xxxxxx5 halves and DuckDB rounds HALF_UP (ADVICE r5)
        assert abs(got[int(v)] - _r6(r[idx[int(v)]])) < 1e-12, int(v)


def test_lpa_oracle_matches_numpy_rounds(duck, edges):
    agg: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        agg[(int(s), int(d))] = agg.get((int(s), int(d)), 0.0) + w
        agg[(int(d), int(s))] = agg.get((int(d), int(s)), 0.0) + w
    verts = sorted({s for s, _ in agg} | {d for _, d in agg})
    labels = {v: v for v in verts}
    for _ in range(5):
        acc: dict[tuple[int, int], float] = {}
        for (s, d), w in agg.items():
            key = (s, labels[d])
            acc[key] = acc.get(key, 0.0) + w
        best: dict[int, tuple[float, int]] = {}
        for (s, lab), w in acc.items():
            cur = best.get(s)
            if cur is None or w > cur[0] or (w == cur[0] and lab < cur[1]):
                best[s] = (w, lab)
        labels = {v: (best[v][1] if v in best else labels[v]) for v in verts}
    got = dict(duck.execute(entrymod.oracle_sql()["label_propagation"]).fetchall())
    assert got == labels


def test_ann_topk_oracle_matches_numpy(duck):
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    order = np.argsort(tbl["vec_id"])
    emb = np.array(tbl["embedding"], dtype=np.float32)[order]
    assert (np.array(tbl["vec_id"])[order] == np.arange(len(order))).all()
    n_tables, n_planes, n_queries, k = 8, 8, 5, 10
    n, dim = emb.shape
    W = np.array(
        [
            [((gp * 131 + d * 197) % 7) - 3 for d in range(dim)]
            for gp in range(n_tables * n_planes)
        ],
        dtype=np.float64,
    )
    dots = emb.astype(np.float64) @ W.T
    buckets = np.zeros((n, n_tables), dtype=np.int64)
    for t in range(n_tables):
        for p in range(n_planes):
            buckets[:, t] += (dots[:, t * n_planes + p] > 0) * (1 << p)
    want = []
    for q in range(n_queries):
        cand: set[int] = set()
        for t in range(n_tables):
            cand |= set(np.nonzero(buckets[:, t] == buckets[q, t])[0].tolist())
        cand.discard(q)
        qe = emb[q].astype(np.float64)
        scored = []
        for c in sorted(cand):
            ce = emb[c].astype(np.float64)
            cos = _r6(float(qe @ ce / (np.sqrt(qe @ qe) * np.sqrt(ce @ ce))))
            scored.append((c, cos))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (c, cos) in enumerate(scored[:k], 1):
            want.append((q, c, cos, rank))
    got = sorted(map(tuple, duck.execute(entrymod.oracle_sql()["ann_topk"]).fetchall()))
    assert got == sorted(want)


def test_media_features_oracle_matches_numpy(duck):
    from slmpy_spark.textops.multimodal import FEAT_DIM, _decode_payload

    docs = duck.execute("SELECT doc_id, text FROM documents").fetchall()
    want = {}
    for doc_id, text in docs:
        payload = text.encode("utf-8")
        feat = _decode_payload(payload, "any", "fake")
        want[doc_id] = (
            "image" if doc_id % 2 == 0 else "audio",
            len(payload),
            tuple(_r6(float(np.float64(x))) for x in feat),
        )
    rows = duck.execute(entrymod.oracle_sql()["media_features"]).fetchall()
    assert len(rows) == len(want)
    for row in rows:
        kind, n_bytes, feats = row[1], row[2], tuple(row[3:])
        assert (kind, n_bytes, feats) == want[row[0]], row[0]
