"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship pipeline at sf0.001 — documents → pseudo-link
edges → PageRank → top-10 page ranks.

queries()/oracle_sql(): one entry per operator (SURVEY.md §3); the
edge table is derived from the driver's `documents` table with a
deterministic arithmetic token rule computed identically by Spark and
DuckDB (slmpy_spark.sources.docs — no cross-engine hash reconciliation
needed).  Iterative operators (pagerank/cc-by-iteration/slm/louvain/
lpa-to-convergence) are not ANSI-SQL-expressible except where noted
(cc via recursive CTE, lpa single round) and get rows-only checks;
their numeric parity is covered by pytest oracles in tests/.
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
        # iterative ops — rows-only checks (pytest oracles cover values)
        "pagerank": lambda spark, sf: engine.pagerank(
            _edges(spark, sf), tol=1e-8, max_iter=40
        ),
        "slm": lambda spark, sf: engine.slm(_edges(spark, sf), seed=42, mode="exact")[0],
        "louvain": lambda spark, sf: engine.louvain(
            _edges(spark, sf), seed=42, mode="exact"
        )[0],
        "label_propagation": lambda spark, sf: engine.label_propagation(
            _edges(spark, sf), max_iter=5
        ),
    }


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
        # pagerank / slm / louvain / label_propagation: no ANSI-SQL
        # equivalent (iterative fixpoints) → rows-only driver check;
        # value parity is enforced by tests/test_graph_ops.py and
        # tests/test_slm_spark.py against numpy oracles.
    }
