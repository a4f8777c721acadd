"""documents → edges: the deterministic pseudo-link rule shared with
the DuckDB oracle (FIXTURES.md §4).

The driver's `documents(doc_id, text, lang, source, n_chars)` table has
dense doc_ids 0..N-1.  An edge src→dst exists for every whitespace
token of a document, with

    dst = (doc_id*131 + length(token)*97 + ascii(token)*1009) mod N

and weight = token multiplicity per (src,dst).  Every term is exactly
computable in both Spark SQL and DuckDB SQL (split/string_split,
length, ascii, %), so the oracle comparison needs no cross-engine hash
reconciliation.  Self-edges dropped; dst is always a valid doc_id by
construction (mod N over dense ids).

The Spark side is 100% built-in expressions (whole-stage codegen):
split → explode → arithmetic → groupBy. One shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The same rule as ANSI SQL for DuckDB (documents view pre-registered).
DOCS_EDGES_SQL = """
SELECT src, dst, weight FROM (
  SELECT d.doc_id AS src,
         (d.doc_id * 131 + length(t.token) * 97 + ascii(t.token) * 1009)
           % (SELECT max(doc_id) + 1 FROM documents) AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
  WHERE t.token <> ''
  GROUP BY 1, 2
) WHERE src <> dst
"""


def documents_to_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    tok = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(F.split("text", " ")).alias("token"),
    ).where(F.col("token") != "")
    return (
        tok.select(
            "src",
            (
                (
                    F.col("src") * F.lit(131)
                    + F.length("token") * F.lit(97)
                    + F.ascii("token") * F.lit(1009)
                )
                % F.lit(int(n))
            ).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
