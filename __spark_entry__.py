"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship pipeline at sf0.001 — documents → pseudo-link
edges → PageRank → top-10 page ranks.

queries()/oracle_sql(): one entry per operator (SURVEY.md §3); the
edge table is derived from the driver's `documents` table with a
deterministic arithmetic token rule computed identically by Spark and
DuckDB (slmpy_spark.sources.docs — no cross-engine hash reconciliation
needed).  Fixed-iteration operators get FULL value oracles via
generated unrolled-CTE SQL (pagerank 10 iterations, LPA 5 rounds —
every per-step CTE is MATERIALIZED: DuckDB otherwise inlines each of
the ~3 references per step and the chain expands 3^n times, observed
as file-handle exhaustion against parquet-backed views); cc gets a
recursive CTE; ann_topk/media_features are integer-deterministic and
fully oracled.  Only data-dependent fixpoints (slm/louvain, tol-driven
convergence) and engine-specific 64-bit hashes (minhash/simhash) stay
rows-only, with pytest numeric oracles covering their values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slmpy_spark import engine
from slmpy_spark.graph.aggregate import aggregate_graph, relabel_by_size
from slmpy_spark.graph.labelprop import lpa_round
from slmpy_spark.graph.modularity import community_aggregates
from slmpy_spark.graph.triangles import triangles
from slmpy_spark.sources.docs import documents_to_edges
from slmpy_spark.textops import analysis, dedup, multimodal, similarity

# ---------------------------------------------------------------------
# shared SQL prelude: the deterministic documents→edges rule + the
# symmetrized view, exactly mirroring slmpy_spark.sources.docs /
# graph.edges.symmetrize
_SQL_PRELUDE = """
WITH RECURSIVE edges AS (
  SELECT src, dst, weight FROM (
    SELECT d.doc_id AS src,
           (d.doc_id * 131 + length(t.token) * 97 + ascii(t.token) * 1009)
             % (SELECT max(doc_id) + 1 FROM documents) AS dst,
           CAST(count(*) AS DOUBLE) AS weight
    FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
    WHERE t.token <> ''
    GROUP BY 1, 2
  ) WHERE src <> dst
),
sym AS (
  SELECT src, dst, sum(weight) AS weight FROM (
    SELECT src, dst, weight FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst, weight FROM edges
  ) GROUP BY 1, 2
),
verts AS (SELECT DISTINCT src AS id FROM sym),
deg AS (SELECT src AS id, sum(weight) AS w_deg FROM sym GROUP BY 1)
"""

_N_COMM = 7  # fixed pseudo-assignment (id % 7) for aggregation oracles


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return documents_to_edges(spark, sf_dir)


def _sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    return engine.symmetrize(_edges(spark, sf_dir))


def _assign_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-assignment: community = id % 7."""
    return engine.vertices(_edges(spark, sf_dir)).select(
        "id", (F.col("id") % _N_COMM).alias("community")
    )


# ---------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → edges → PageRank → top 10 (sf0.001)."""
    edges = _edges(spark, "/root/testdata/sf0.001")
    ranks = engine.pagerank(edges, tol=1e-8, max_iter=50)
    return ranks.orderBy(F.desc("rank"), F.asc("id")).limit(10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # S-layer: edge derivation
        "edges": lambda spark, sf: _edges(spark, sf),
        # G1/G2/P5: degrees
        "degrees": lambda spark, sf: engine.degrees(_sym(spark, sf)),
        "out_degrees": lambda spark, sf: engine.out_degrees(_edges(spark, sf)),
        "in_degrees": lambda spark, sf: engine.in_degrees(_edges(spark, sf)),
        # §2.2 symmetrize
        "symmetrize": lambda spark, sf: _sym(spark, sf),
        # G7: graph aggregation (super-edges over id%7 communities)
        "supergraph": lambda spark, sf: aggregate_graph(
            _sym(spark, sf), _assign_mod(spark, sf)
        )[0],
        "self_weights": lambda spark, sf: aggregate_graph(
            _sym(spark, sf), _assign_mod(spark, sf)
        )[1],
        # G3: modularity terms per community
        "modularity_terms": lambda spark, sf: community_aggregates(
            _sym(spark, sf), _assign_mod(spark, sf)
        ),
        # G10: canonical relabel
        "relabel_by_size": lambda spark, sf: relabel_by_size(_assign_mod(spark, sf)),
        # P4: triangles
        "triangle_total": lambda spark, sf: triangles(_edges(spark, sf)).agg(
            F.count("*").alias("n_triangles")
        ),
        "triangles_per_vertex": lambda spark, sf: engine.triangle_count(
            _edges(spark, sf)
        )[1],
        # P3: one synchronous LPA round from singleton labels
        "lpa_one_round": lambda spark, sf: _lpa_one_round(spark, sf),
        # P2: connected components (exact; oracle via recursive CTE)
        "connected_components": lambda spark, sf: engine.connected_components(
            _edges(spark, sf)
        ),
        # P1: fixed 10 power iterations (tol=0 → no data-dependent early
        # exit, so the unrolled DuckDB twin computes the same fixpoint
        # prefix; entry() exercises the tol-driven convergence mode and
        # tests/ pin its numeric parity).  Both sides round to 6dp —
        # the driver hashes values, and grouped double sums are
        # order-sensitive at the last few ulps.
        "pagerank": lambda spark, sf: engine.pagerank(
            _edges(spark, sf), tol=0.0, max_iter=10
        ).select("id", F.round("rank", 6).alias("rank")),
        # rows-only: data-dependent fixpoints (pytest oracles cover values)
        "slm": lambda spark, sf: engine.slm(_edges(spark, sf), seed=42, mode="exact")[0],
        "louvain": lambda spark, sf: engine.louvain(
            _edges(spark, sf), seed=42, mode="exact"
        )[0],
        # P3 multi-round: 5 synchronous rounds, unrolled in the oracle.
        # The engine early-exits on a no-change round; a converged
        # labeling is a fixed point of the round function, so the
        # oracle's remaining unrolled rounds reproduce it unchanged.
        "label_propagation": lambda spark, sf: engine.label_propagation(
            _edges(spark, sf), max_iter=5
        ),
        # ---- training-pipeline textops over documents/embeddings ----
        "token_stats": lambda spark, sf: analysis.token_stats(_docs(spark, sf)),
        "quality_score": lambda spark, sf: analysis.quality_score(_docs(spark, sf)),
        "lang_id": lambda spark, sf: analysis.lang_id(_docs(spark, sf)),
        "exact_duplicates": lambda spark, sf: dedup.exact_duplicates(
            _docs(spark, sf)
        ),
        "jaccard_pairs": lambda spark, sf: dedup.ngram_jaccard_pairs(
            _docs(spark, sf), threshold=0.2
        ),
        "cosine_pairs": lambda spark, sf: similarity.cosine_pairs(
            _emb(spark, sf), max_id=20
        ),
        "cosine_topk": lambda spark, sf: similarity.cosine_topk(
            _emb(spark, sf), k=10, n_queries=5
        ),
        "lsh_buckets": lambda spark, sf: similarity.lsh_buckets(
            _emb(spark, sf), n_planes=8
        ),
        # rows-only (cross-engine hash functions differ by design)
        "minhash_lsh_candidates": lambda spark, sf: dedup.lsh_candidates(
            _docs(spark, sf), k=32, bands=16
        ),
        # the composed 100TB dedup path end-to-end: LSH candidate pairs
        # → exact Jaccard verify restricted to them (rows-only: the
        # candidate set is minhash-dependent, so no portable SQL twin).
        # FUSED: one shared shingle computation across both stages
        "dedup_verified": lambda spark, sf: dedup.verified_pairs(
            _docs(spark, sf), threshold=0.2, k=32, bands=16
        ),
        "simhash_signatures": lambda spark, sf: dedup.simhash_signatures(
            _docs(spark, sf)
        ),
        "ann_topk": lambda spark, sf: similarity.ann_topk(
            _emb(spark, sf), k=10, n_planes=8, n_queries=5
        ),
        # array columns projected to CSV strings *in the query lambda
        # only* (engine APIs keep arrays): the driver's canonicalizer
        # sorts every column pandas-side and dies on list cells
        "minhash_signatures": lambda spark, sf: dedup.minhash_signatures(
            _docs(spark, sf), k=16
        ).select(
            "doc_id",
            F.concat_ws(",", F.col("sig").cast("array<string>")).alias("sig_csv"),
        ),
        "simhash_candidates": lambda spark, sf: dedup.simhash_candidates(
            _docs(spark, sf), max_hamming=3
        ),
        # feat projected to 16 rounded double columns (not a CSV string:
        # the driver hashes cell values, and double→string formatting is
        # the one step the two engines render differently; float32 →
        # double widening + HALF_UP 6dp rounding are bit-identical)
        "media_features": lambda spark, sf: multimodal.media_features(
            multimodal.docs_to_media(_docs(spark, sf))
        ).select(
            "media_id",
            "kind",
            "n_bytes",
            *[
                F.round(F.element_at("feat", i + 1).cast("double"), 6).alias(f"f{i:02d}")
                for i in range(multimodal.FEAT_DIM)
            ],
        ),
        # banded multi-table ANN bucketing — integer-deterministic, so
        # it gets a full DuckDB value oracle (covers the ANN path's
        # hashing; the top-k itself stays rows-only by design)
        "ann_bucket_tables": lambda spark, sf: similarity.lsh_bucket_tables(
            _emb(spark, sf), n_tables=4, n_planes=6
        ).select("vec_id", F.col("table").alias("tbl"), "bucket"),
        # flagship distributed path at driver scale (exact_threshold low
        # enough that level 0 runs the JVM-side sweep, not the exact kernel)
        "slm_scale": lambda spark, sf: engine.slm(
            _edges(spark, sf), seed=42, mode="scale", max_sweeps=4,
            exact_threshold=2_000,
        )[0],
    }


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/documents.parquet")


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _lsh_weights_sql(n_planes: int = 8) -> str:
    """DuckDB literal weight lists mirroring similarity.lsh_buckets:
    w[p][d] = ((p*131 + d*197) % 7) - 3 over 64 dims."""
    cases = []
    for p in range(n_planes):
        w = [((p * 131 + d * 197) % 7) - 3 for d in range(64)]
        lit = "[" + ", ".join(f"{x}.0" for x in w) + "]"
        cases.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {lit}) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(cases)


def _lsh_tables_sql(n_tables: int, n_planes: int) -> str:
    """DuckDB twin of similarity.lsh_bucket_tables: per-table UNION ALL
    with literal weight lists w[gp][d] = ((gp*131 + d*197) % 7) - 3,
    gp = t*n_planes + p, bit value 2^p."""
    parts = []
    for t in range(n_tables):
        cases = []
        for p in range(n_planes):
            gp = t * n_planes + p
            w = [((gp * 131 + d * 197) % 7) - 3 for d in range(64)]
            lit = "[" + ", ".join(f"{x}.0" for x in w) + "]"
            cases.append(
                f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {lit}) > 0 "
                f"THEN {1 << p} ELSE 0 END)"
            )
        parts.append(
            f"SELECT vec_id, {t} AS tbl, "
            f"CAST({' + '.join(cases)} AS BIGINT) AS bucket FROM embeddings"
        )
    return " UNION ALL ".join(parts)


def _pagerank_sql(n_iter: int = 10, d: float = 0.85) -> str:
    """Unrolled power-iteration twin of engine.pagerank(tol=0,
    max_iter=n_iter): r_{t+1}(v) = (1-d)/n + d·dmass_t/n + d·Σ_{u→v}
    r_t(u)/out_deg(u), dmass_t = Σ rank over no-out-edge vertices.
    Every per-step CTE is MATERIALIZED — each is referenced up to 3
    times, and DuckDB's default inlining would expand the chain 3^n
    times (observed: parquet file-handle exhaustion at n=10)."""
    parts = [
        """
        , outd AS MATERIALIZED (
            SELECT src AS id, CAST(count(*) AS DOUBLE) AS od
            FROM edges GROUP BY 1)
        , nv AS MATERIALIZED (
            SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)
        , r0 AS MATERIALIZED (
            SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM verts)"""
    ]
    for t in range(n_iter):
        parts.append(f"""
        , dm{t} AS MATERIALIZED (
          SELECT coalesce(sum(r.rank), 0.0) AS dm
          FROM r{t} r LEFT JOIN outd o ON o.id = r.id WHERE o.id IS NULL)
        , c{t + 1} AS MATERIALIZED (
          SELECT e.dst AS id, sum(r.rank / o.od) AS c
          FROM edges e JOIN r{t} r ON r.id = e.src
                       JOIN outd o ON o.id = e.src
          GROUP BY 1)
        , r{t + 1} AS MATERIALIZED (
          SELECT v.id,
                 (1.0 - {d}) / (SELECT n FROM nv)
                 + {d} * (SELECT dm FROM dm{t}) / (SELECT n FROM nv)
                 + {d} * coalesce(c.c, 0.0) AS rank
          FROM verts v LEFT JOIN c{t + 1} c ON c.id = v.id)""")
    parts.append(f"\n        SELECT id, round(rank, 6) AS rank FROM r{n_iter}")
    return "".join(parts)


def _lpa_sql(rounds: int = 5) -> str:
    """Unrolled synchronous-LPA twin of engine.label_propagation: each
    round every vertex adopts the max-total-weight neighbor label, ties
    → min label, isolated vertices keep theirs.  sym weights are sums
    of integral token counts, so the w comparisons are exact in both
    engines.  MATERIALIZED for the same 2^n-inlining reason as
    _pagerank_sql."""
    parts = ["\n        , l0 AS MATERIALIZED (SELECT id, id AS label FROM verts)"]
    for t in range(1, rounds + 1):
        parts.append(f"""
        , n{t} AS MATERIALIZED (
          SELECT s.src AS id, l.label, sum(s.weight) AS w
          FROM sym s JOIN l{t - 1} l ON l.id = s.dst GROUP BY 1, 2)
        , b{t} AS MATERIALIZED (
          SELECT id, label AS nl FROM (
            SELECT id, label,
                   row_number() OVER (
                     PARTITION BY id ORDER BY w DESC, label ASC) AS rn
            FROM n{t}) WHERE rn = 1)
        , l{t} AS MATERIALIZED (
          SELECT l.id, coalesce(b.nl, l.label) AS label
          FROM l{t - 1} l LEFT JOIN b{t} b ON b.id = l.id)""")
    parts.append(f"\n        SELECT id, label FROM l{rounds}")
    return "".join(parts)


def _ann_topk_sql(
    k: int = 10, n_planes: int = 8, n_queries: int = 5, n_tables: int = 8
) -> str:
    """Twin of similarity.ann_topk: candidates share ANY (table,
    bucket) of the deterministic integer-plane tables, exact rounded
    cosine ranks them."""
    return f"""
    WITH bt AS MATERIALIZED ({_lsh_tables_sql(n_tables, n_planes)}),
    cand AS MATERIALIZED (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id
      FROM bt q JOIN bt c ON c.tbl = q.tbl AND c.bucket = q.bucket
      WHERE q.vec_id < {n_queries} AND c.vec_id <> q.vec_id),
    scored AS (
      SELECT cand.query_id, cand.vec_id,
             round(
               list_dot_product(CAST(qe.embedding AS DOUBLE[]),
                                CAST(ce.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(qe.embedding AS DOUBLE[]),
                                        CAST(qe.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(ce.embedding AS DOUBLE[]),
                                          CAST(ce.embedding AS DOUBLE[])))),
               6) AS cos
      FROM cand JOIN embeddings qe ON qe.vec_id = cand.query_id
                JOIN embeddings ce ON ce.vec_id = cand.vec_id)
    SELECT query_id, vec_id, cos, rank FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)
             AS INT) AS rank
      FROM scored)
    WHERE rank <= {k}"""


def _media_sql(feat_dim: int) -> str:
    """Twin of multimodal.docs_to_media → media_features with the fake
    decode: feat[i] = |{{bytes b : b % dim = i}}| / n_bytes as float32.
    The documents text is ASCII (asserted by the byte-length check
    below failing the join otherwise), so byte values are ascii() code
    points; CAST(.. AS REAL) replicates the kernel's float32
    quantization before the shared double 6dp rounding."""
    fcols = ", ".join(
        f"round(CAST(CAST(coalesce(h.c{i}, 0) / CAST(b.n AS DOUBLE) AS REAL)"
        f" AS DOUBLE), 6) AS f{i:02d}"
        for i in range(feat_dim)
    )
    hcols = ", ".join(
        f"sum(CASE WHEN bucket = {i} THEN 1 ELSE 0 END) AS c{i}"
        for i in range(feat_dim)
    )
    return f"""
    WITH b AS MATERIALIZED (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
             text, octet_length(encode(text)) AS n_bytes,
             length(text) AS n
      FROM documents),
    ch AS (
      SELECT media_id,
             ascii(substr(text, CAST(i AS INT) + 1, 1)) % {feat_dim} AS bucket
      FROM b, unnest(range(0, n)) AS t(i)),
    h AS (SELECT media_id, {hcols} FROM ch GROUP BY 1)
    SELECT b.media_id, b.kind, CAST(b.n_bytes AS BIGINT) AS n_bytes, {fcols}
    FROM b LEFT JOIN h ON h.media_id = b.media_id"""


def _lpa_one_round(spark: SparkSession, sf: str) -> DataFrame:
    sym = _sym(spark, sf)
    verts = engine.vertices(sym)
    labels = verts.select("id", F.col("id").alias("label"))
    return lpa_round(sym, labels, verts)


def oracle_sql() -> dict[str, str]:
    p = _SQL_PRELUDE
    return {
        "edges": p + "SELECT src, dst, weight FROM edges",
        "degrees": p + "SELECT id, w_deg FROM deg",
        "out_degrees": p
        + """
        SELECT src AS id, count(*) AS out_deg, sum(weight) AS out_w
        FROM edges GROUP BY 1""",
        "in_degrees": p
        + """
        SELECT dst AS id, count(*) AS in_deg, sum(weight) AS in_w
        FROM edges GROUP BY 1""",
        "symmetrize": p + "SELECT src, dst, weight FROM sym",
        "supergraph": p
        + f"""
        SELECT src % {_N_COMM} AS src, dst % {_N_COMM} AS dst,
               sum(weight) AS weight
        FROM sym WHERE src % {_N_COMM} <> dst % {_N_COMM} GROUP BY 1, 2""",
        "self_weights": p
        + f"""
        SELECT src % {_N_COMM} AS id, sum(weight) AS self_weight
        FROM sym WHERE src % {_N_COMM} = dst % {_N_COMM} GROUP BY 1""",
        "modularity_terms": p
        + f"""
        , sin AS (
          SELECT src % {_N_COMM} AS community, sum(weight) AS sigma_in
          FROM sym WHERE src % {_N_COMM} = dst % {_N_COMM} GROUP BY 1)
        , stot AS (
          SELECT id % {_N_COMM} AS community, sum(w_deg) AS sigma_tot,
                 count(*) AS n_nodes
          FROM deg GROUP BY 1)
        SELECT s.community, coalesce(sin.sigma_in, 0.0) AS sigma_in,
               s.sigma_tot, s.n_nodes
        FROM stot s LEFT JOIN sin ON sin.community = s.community""",
        "relabel_by_size": p
        + f"""
        , a AS (SELECT id, id % {_N_COMM} AS community FROM verts)
        , sizes AS (SELECT community, count(*) AS cnt FROM a GROUP BY 1)
        , mapping AS (
          SELECT community,
                 CAST(row_number() OVER (ORDER BY cnt DESC, community ASC) - 1
                      AS BIGINT) AS new_c
          FROM sizes)
        SELECT a.id, m.new_c AS community
        FROM a JOIN mapping m ON a.community = m.community""",
        "triangle_total": p
        + """
        , dcnt AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY 1)
        , o AS (
          SELECT s.src AS u, s.dst AS v FROM sym s
          JOIN dcnt du ON du.id = s.src JOIN dcnt dv ON dv.id = s.dst
          WHERE (du.d < dv.d) OR (du.d = dv.d AND s.src < s.dst))
        SELECT count(*) AS n_triangles
        FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.v <> w2.v
        WHERE EXISTS (SELECT 1 FROM o e WHERE e.u = w1.v AND e.v = w2.v)""",
        "triangles_per_vertex": p
        + """
        , dcnt AS (SELECT src AS id, count(*) AS d FROM sym GROUP BY 1)
        , o AS (
          SELECT s.src AS u, s.dst AS v FROM sym s
          JOIN dcnt du ON du.id = s.src JOIN dcnt dv ON dv.id = s.dst
          WHERE (du.d < dv.d) OR (du.d = dv.d AND s.src < s.dst))
        , tri AS (
          SELECT w1.u AS a, w1.v AS b, w2.v AS c
          FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.v <> w2.v
          WHERE EXISTS (SELECT 1 FROM o e WHERE e.u = w1.v AND e.v = w2.v))
        , corners AS (
          SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        SELECT v.id, CAST(coalesce(t.cnt, 0) AS BIGINT) AS triangles
        FROM verts v LEFT JOIN (
          SELECT id, count(*) AS cnt FROM corners GROUP BY 1) t
        ON v.id = t.id""",
        "lpa_one_round": p
        + """
        , nbr AS (
          SELECT src AS id, dst AS label, sum(weight) AS w
          FROM sym GROUP BY 1, 2)
        , best AS (
          SELECT id, label,
                 row_number() OVER (PARTITION BY id ORDER BY w DESC, label ASC)
                   AS rn
          FROM nbr)
        SELECT id, label FROM best WHERE rn = 1""",
        "connected_components": p
        + """
        , reach(id, r) AS (
          SELECT id, id FROM verts
          UNION
          SELECT e.dst, reach.r FROM reach JOIN sym e ON e.src = reach.id)
        SELECT id, min(r) AS component FROM reach GROUP BY id""",
        # ---------------- textops oracles ----------------
        "token_stats": """
        SELECT doc_id, count(*) AS n_tokens,
               count(DISTINCT token) AS n_distinct_tokens,
               sum(length(token)) / CAST(count(*) AS DOUBLE) AS avg_token_len
        FROM (
          SELECT d.doc_id, t.token
          FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
          WHERE t.token <> '')
        GROUP BY 1""",
        "quality_score": f"""
        WITH base AS (
          SELECT doc_id,
                 length(text) AS n_chars_txt,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                   / CAST(nullif(length(text), 0) AS DOUBLE) AS alpha_ratio,
                 length(regexp_replace(text, '[^0-9]', '', 'g'))
                   / CAST(nullif(length(text), 0) AS DOUBLE) AS digit_ratio,
                 length(regexp_replace(text, '[^ ]', '', 'g'))
                   / CAST(nullif(length(text), 0) AS DOUBLE) AS space_ratio
          FROM documents),
        stops AS (
          SELECT d.doc_id,
                 sum(CASE WHEN t.token IN ({_sql_list(analysis.STOPWORDS_EN)})
                          THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)
                   AS stop_ratio
          FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
          WHERE t.token <> ''
          GROUP BY 1)
        SELECT b.doc_id, b.n_chars_txt, b.alpha_ratio, b.digit_ratio,
               b.space_ratio, coalesce(s.stop_ratio, 0.0) AS stop_ratio,
               round(0.5 * b.alpha_ratio + 0.3 * coalesce(s.stop_ratio, 0.0)
                     + 0.2 * (1 - b.digit_ratio), 6) AS quality
        FROM base b LEFT JOIN stops s ON b.doc_id = s.doc_id""",
        "lang_id": f"""
        WITH wl(wl_lang, token) AS (VALUES {_lang_values_sql()}),
        hits AS (
          SELECT d.doc_id, wl.wl_lang, count(*) AS hits
          FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
          JOIN wl ON wl.token = t.token
          GROUP BY 1, 2),
        best AS (
          SELECT doc_id, wl_lang, hits,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY hits DESC, wl_lang ASC) AS rn
          FROM hits)
        SELECT d.doc_id,
               coalesce(b.wl_lang, 'und') AS lang_pred,
               coalesce(b.hits, 0) AS lang_hits
        FROM documents d LEFT JOIN best b
          ON d.doc_id = b.doc_id AND b.rn = 1""",
        "exact_duplicates": """
        WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
        g AS (SELECT hh, min(doc_id) AS canonical_id, count(*) AS group_size
              FROM h GROUP BY 1)
        SELECT h.doc_id, g.canonical_id, g.group_size
        FROM h JOIN g ON h.hh = g.hh""",
        "jaccard_pairs": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS ts
          FROM documents),
        idx AS (
          SELECT doc_id, ts,
                 unnest(range(0, greatest(len(ts) - 3, 0) + 1)) AS i
          FROM toks),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(ts[i + 1 : i + 3], chr(31)) AS shingle
          FROM idx),
        sh2 AS (SELECT doc_id, shingle FROM sh WHERE length(shingle) > 0),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY 1),
        inter AS (
          SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS i
          FROM sh2 l JOIN sh2 r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
          GROUP BY 1, 2)
        SELECT a, b,
               round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id = a
                   JOIN sizes sb ON sb.doc_id = b
        WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) >= 0.2""",
        "cosine_pairs": """
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(
                 list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                          CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])))),
                 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 20 AND b.vec_id < 20""",
        "cosine_topk": """
        WITH scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 round(
                   list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[])))),
                   6) AS cos
          FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 5)
        SELECT query_id, vec_id, cos, rank FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)
                 AS INT) AS rank
          FROM scored)
        WHERE rank <= 10""",
        "lsh_buckets": f"""
        SELECT vec_id, CAST({_lsh_weights_sql(8)} AS BIGINT) AS bucket
        FROM embeddings""",
        "ann_bucket_tables": _lsh_tables_sql(4, 6),
        # fixed-iteration graph ops: generated unrolled-CTE twins
        "pagerank": p + _pagerank_sql(n_iter=10, d=0.85),
        "label_propagation": p + _lpa_sql(rounds=5),
        # banded-LSH ANN + the fake-decode multimodal kernel: integer-
        # deterministic end-to-end, fully oracled
        "ann_topk": _ann_topk_sql(k=10, n_planes=8, n_queries=5, n_tables=8),
        "media_features": _media_sql(multimodal.FEAT_DIM),
        # slm / slm_scale / louvain (data-dependent fixpoints, seeded
        # tie-breaking) and minhash_signatures / minhash_lsh_candidates
        # / dedup_verified / simhash_signatures / simhash_candidates
        # (engine-specific 64-bit hashes by design): no portable
        # ANSI-SQL equivalent → rows-only driver check; value parity is
        # enforced by pytest oracles in tests/.
    }


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _lang_values_sql() -> str:
    return ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in analysis.LANG_WORDS.items()
        for w in words
    )
