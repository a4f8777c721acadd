"""Edge-table primitives (SURVEY.md §2, §3.2 G1/G2/G11, §3.3 P5).

Canonical schemas:

    edges : src long, dst long, weight double   (directed, deduped, no self-loops)
    sym   : src long, dst long, weight double   (both directions; reciprocal
                                                 weights summed; no self-loops)

All functions are pure DataFrame transformations — single shuffle each
(hash aggregation with map-side partial combine), fully Catalyst/AQE
optimizable, no Python UDFs.  At 100 TB the groupBys here are plain
hash-partitioned aggregations on (src[,dst]); AQE coalesces the output
partitioning, and downstream joins on src reuse the hash partitioning
when `spark.sql.shuffle.partitions` is stable across stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "weight")


def normalize_edges(df: DataFrame, weighted: bool = True) -> DataFrame:
    """Coerce an arbitrary (src, dst[, weight]) frame into the canonical
    edge table: long ids, double weights, self-loops dropped, parallel
    edges summed.  One shuffle (groupBy src,dst)."""
    cols = [F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")]
    if weighted and "weight" in df.columns:
        cols.append(F.col("weight").cast("double").alias("weight"))
    else:
        cols.append(F.lit(1.0).alias("weight"))
    return (
        df.select(*cols)
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: edges ∪ reverse(edges), reciprocal weights summed
    (SURVEY.md §2.2).  Self-loops are assumed already dropped.

    Used by SLM/Louvain/LPA/CC/triangles; PageRank runs on the directed
    table.  Cost: one union (no shuffle) + one hash agg (one shuffle).
    """
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
    )
    return (
        edges.select("src", "dst", "weight")
        .unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing as src or dst. One shuffle (distinct)."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def degrees(sym: DataFrame) -> DataFrame:
    """Weighted degree k_i = Σ_j w_ij over the *symmetrized* table
    (reference: Network node weights; SURVEY G1).  Returns (id, w_deg)."""
    return sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("w_deg"))


def out_degrees(edges: DataFrame) -> DataFrame:
    """Directed out-degree (count and weight) — PageRank support (P5)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg"), F.sum("weight").alias("out_w")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    """Directed in-degree (count and weight)."""
    return edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_deg"), F.sum("weight").alias("in_w")
    )


def total_weight(sym: DataFrame) -> float:
    """2m for an undirected graph given its symmetrized table (each
    undirected edge contributes twice).  Driver-side scalar (G2)."""
    row = sym.agg(F.sum("weight").alias("tw")).first()
    return float(row["tw"] or 0.0)


def init_singletons(verts: DataFrame) -> DataFrame:
    """cluster[i] = i (G11). Returns assign(id, community)."""
    return verts.select(F.col("id"), F.col("id").alias("community"))
