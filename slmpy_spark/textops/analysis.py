"""Text analysis over documents(doc_id, text, lang, source, n_chars):
token counting, quality scoring, language ID (SURVEY-adjacent
training-pipeline ops).  Every op is 100% built-in expressions
(whole-stage codegen, no Python) and has an exact DuckDB SQL twin in
__spark_entry__ — the formulas below are written to be computable
identically in both engines (integer/length/regexp arithmetic only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
# language ID; deterministic, versioned (v1)
LANG_WORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "que", "y", "en", "los", "una"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
}

STOPWORDS_EN = LANG_WORDS["en"]


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics: (doc_id, n_tokens,
    n_distinct_tokens, avg_token_len). Whitespace tokenization."""
    t = _tokens(docs)
    return t.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct_tokens"),
        (F.sum(F.length("token")) / F.count("*")).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality (doc_id, n_chars_txt, alpha_ratio,
    digit_ratio, space_ratio, stop_ratio, quality):

      alpha_ratio = alphabetic chars / total chars
      digit_ratio = digits / total chars
      space_ratio = spaces / total chars
      stop_ratio  = english stopword tokens / tokens
      quality     = round(0.5*alpha + 0.3*stop + 0.2*(1-digit), 6)

    All length/regexp arithmetic — identical in Spark and DuckDB.
    """
    n = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    space = F.length(F.regexp_replace("text", "[^ ]", ""))
    base = docs.select(
        "doc_id",
        n.alias("n_chars_txt"),
        (alpha / F.nullif(n, F.lit(0))).alias("alpha_ratio"),
        (digit / F.nullif(n, F.lit(0))).alias("digit_ratio"),
        (space / F.nullif(n, F.lit(0))).alias("space_ratio"),
    )
    t = _tokens(docs)
    stops = t.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("token").isin(STOPWORDS_EN), 1).otherwise(0))
            / F.count("*")
        ).alias("stop_ratio")
    )
    return base.join(stops, "doc_id", "left").select(
        "doc_id",
        "n_chars_txt",
        "alpha_ratio",
        "digit_ratio",
        "space_ratio",
        F.coalesce("stop_ratio", F.lit(0.0)).alias("stop_ratio"),
        F.round(
            0.5 * F.col("alpha_ratio")
            + 0.3 * F.coalesce("stop_ratio", F.lit(0.0))
            + 0.2 * (1 - F.col("digit_ratio")),
            6,
        ).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID: (doc_id, lang_pred, lang_hits).
    argmax of per-language stopword hits, ties → lexicographically
    smallest language code; zero hits → 'und'."""
    spark = docs.sparkSession
    wl = spark.createDataFrame(
        [(lang, w) for lang, words in LANG_WORDS.items() for w in words],
        "wl_lang string, token string",
    )
    t = _tokens(docs)
    hits = (
        t.join(F.broadcast(wl), "token")
        .groupBy("doc_id", "wl_lang")
        .agg(F.count("*").alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("wl_lang"))
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("wl_lang").alias("lang_pred"), F.col("hits").alias("lang_hits"))
    )
    return docs.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
        F.coalesce("lang_hits", F.lit(0)).alias("lang_hits"),
    )
