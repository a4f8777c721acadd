"""Synchronous weighted label propagation (SURVEY.md §3.3 P3).

Semantics (pinned; GraphX-compatible, deterministic):

- labels start as vertex ids;
- each round, every vertex adopts the neighbor label with the highest
  total incident edge weight; ties broken by the **minimum label id**;
- vertices with no neighbors keep their label;
- runs on the symmetrized graph for `max_iter` rounds (synchronous LPA
  on bipartite-ish structures can oscillate, so a fixed iteration cap
  is part of the contract, as in GraphX).

One round = one join + one groupBy + one window — all Catalyst-native,
whole-stage-codegen'd; the window partitions by vertex so the rank-1
filter never materializes a hub's full candidate list on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from slmpy_spark.graph.edges import symmetrize, vertices
from slmpy_spark.util import materialize


def label_propagation(
    edges: DataFrame, max_iter: int = 20, checkpointer=None
) -> DataFrame:
    """Returns assign(id long, label long) after `max_iter` synchronous
    rounds (early-exits when no label changes)."""
    sym = symmetrize(edges).persist()
    verts = vertices(edges).persist()

    labels = verts.select("id", F.col("id").alias("label"))
    labels = labels.transform(materialize)

    for it in range(max_iter):
        new_labels = lpa_round(sym, labels, verts)
        new_labels = new_labels.transform(materialize)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if checkpointer is not None:
            labels = checkpointer.save_state("lpa_labels", it, labels)
        if changed == 0:
            break

    sym.unpersist()
    verts.unpersist()
    return labels


def lpa_round(sym: DataFrame, labels: DataFrame, verts: DataFrame) -> DataFrame:
    """One synchronous LPA round (SQL-expressible — used by the DuckDB
    oracle in __spark_entry__): adopt the max-weight neighbor label,
    ties → min label; isolated vertices keep theirs."""
    nbr = (
        sym.join(labels, sym.dst == labels.id, "inner")
        .groupBy(F.col("src").alias("id"), F.col("label"))
        .agg(F.sum("weight").alias("w"))
    )
    w = Window.partitionBy("id").orderBy(F.desc("w"), F.asc("label"))
    best = (
        nbr.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", F.col("label").alias("new_label"))
    )
    return (
        verts.join(labels, "id")
        .join(best, "id", "left")
        .select("id", F.coalesce(F.col("new_label"), F.col("label")).alias("label"))
    )
