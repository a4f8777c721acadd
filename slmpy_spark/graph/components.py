"""Connected components via alternating small-star / large-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) — SURVEY.md §3.3 P2.

Each vertex carries a current label (initially its own id); rounds of

    large-star: for every edge (u,v) with v > u's label chain, attach
                strictly-larger neighbors to min(neighborhood ∪ self)
    small-star: attach smaller-or-equal neighbors likewise

converge in O(log n) rounds to label = min vertex id of the component.
Hub-safe: both stars are plain groupBy-min aggregations — no vertex
ever enumerates its whole neighborhood in one task, so power-law
graphs don't OOM (vs naive label-prop joins which fan hubs out).

Implementation below is the simplified "label = min over neighbors'
labels, repeat" with *path-halving* (label ← label of label), which
keeps the same O(log n) round bound with two shuffles per round and is
expressible entirely as joins/groupBys (no Python).

Output: assign(id long, component long), component = min id reachable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from slmpy_spark.graph.edges import symmetrize, vertices
from slmpy_spark.util import explain_to, materialize


def connected_components(
    edges: DataFrame, max_iter: int = 50, checkpointer=None,
    leaf_cache: bool = True,
) -> DataFrame:
    """Exact undirected connected components. Returns (id, component).

    `leaf_cache=False` skips the checkpoint leaf under the edge cache
    (saves its fixed block-write job on small inputs — the A/B toggle,
    BENCH/ab_leaf_small.py)."""
    spark = edges.sparkSession
    # pre-hash-partitioned on the per-round join key (dst) and cached:
    # the edge table enters this layout once and never exchanges again —
    # only the vertex-sized label table shuffles per round (the same
    # iterative-join layout as pagerank's contrib_edges)
    # leaf-base the cache (checkpoint, then repartition+persist): the
    # per-round CacheManager lookup and AQE replanning canonicalize the
    # cached plan's embedded lineage every round — a leaf keeps that
    # constant-time regardless of the caller's plan depth (measured for
    # the SLM sweep, BENCH/qe_stage_probe.py).  The leaf outlives the
    # cache (evicted cache partitions recompute from it).
    verts = vertices(edges).persist()
    if verts.count() == 0:
        # before any leaf/cache is built — nothing to leak on this path
        verts.unpersist()
        return spark.createDataFrame([], "id long, component long")
    sym_base = symmetrize(edges).select("src", "dst")
    sym_leaf = materialize(sym_base) if leaf_cache else sym_base
    sym = sym_leaf.repartition("dst").persist()

    labels = verts.select("id", F.col("id").alias("component"))
    labels = labels.transform(materialize)

    for it in range(max_iter):
        # gather: candidate = min(own label, min over neighbors' labels)
        nbr_min = (
            sym.join(labels.select("id", "component"), sym.dst == F.col("id"), "inner")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        cand = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("component").alias("old_c"),
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # path halving: component ← label of component (pointer jump);
        # the changed flag rides along and its sum is OBSERVED on the
        # materialize action itself — one Spark job per round, no
        # separate convergence scan
        jump = cand.select(F.col("id").alias("jid"), F.col("component").alias("jcomp"))
        obs = Observation()
        new_labels = (
            cand.join(jump, cand.component == jump.jid, "left")
            .select(
                "id",
                F.coalesce(F.col("jcomp"), F.col("component")).alias("component"),
                (F.coalesce(F.col("jcomp"), F.col("component")) != F.col("old_c"))
                .cast("int")
                .alias("changed"),
            )
            .observe(obs, F.sum("changed").alias("ch"))
        )
        if it == 0:
            explain_to(new_labels, "cc_round")
        new_labels = new_labels.transform(materialize)

        changed = int(obs.get["ch"] or 0)
        labels.unpersist()
        labels = new_labels
        if checkpointer is not None:
            reread = checkpointer.save_state("cc_labels", it, labels)
            labels.unpersist()
            labels = reread
        if changed == 0:
            break

    sym.unpersist()
    # after the cache built over it is gone; no-op when leaf_cache=False
    sym_leaf.unpersist()
    verts.unpersist()
    return labels.select("id", "component")
