"""PageRank on the directed edge table (SURVEY.md §3.3 P1).

Semantics (pinned for the 1e-6 parity gate, BASELINE.json north_rule):

    r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u)  +  dangling_mass/N )

- outdeg(u) = *count* of distinct out-edges (unweighted contribution
  split, the classic formulation; a weighted variant divides by out_w).
- dangling_mass = Σ r(u) over vertices with no out-edges, redistributed
  uniformly — keeps Σ r = 1 exactly each iteration.
- convergence: max |r' - r| < tol (L∞), checked with a single agg.

Scale notes (100 TB / 1000 executors):
- the per-iteration plan is `ranks ⋈ edges on src` → groupBy(dst).sum.
  Both sides hash-partitioned on the join key; AQE handles hub-dst skew
  (skew-join split).  `edges` is cached once with contribution factor
  precomputed (r is the only per-iteration change).
- lineage is truncated every `checkpoint_interval` iterations via
  localCheckpoint (or a Checkpointer) — without it Catalyst replans a
  k-join-deep tree at iteration k and driver planning time explodes.
- dangling mass and the convergence delta are single driver scalars per
  iteration (two tiny jobs), not collects of vertex data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slmpy_spark.graph.edges import out_degrees, vertices
from slmpy_spark.util import materialize


def pagerank(
    edges: DataFrame,
    d: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    checkpoint_interval: int = 5,
    checkpointer=None,
) -> DataFrame:
    """Return ranks(id long, rank double), Σ rank = 1.

    `checkpointer`: optional slmpy_spark.checkpoint.Checkpointer; when
    given, per-iteration state is persisted (resumable); otherwise
    localCheckpoint truncates lineage in-memory.
    """
    spark = edges.sparkSession

    verts = vertices(edges).persist()
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    # out-edge contribution fraction, fixed across iterations.
    # Persisted PRE-HASH-PARTITIONED on the join key: the cached
    # relation's outputPartitioning satisfies the per-iteration join's
    # requirement, so the 2m-row edge side is shuffled ONCE for the
    # whole run and only the (vertex-sized) ranks side moves per
    # iteration — the big-win layout for iterative joins (bucketing
    # achieves the same across jobs at real scale).
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    contrib_edges = (
        edges.join(out_degrees(edges), edges.src == F.col("id"), "inner")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("frac"))
        .repartition(n_parts, "src")
        .persist()
    )
    contrib_edges.count()  # materialize

    ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.transform(materialize)

    # vertices with no out-edges (dangling); when there are none the
    # per-iteration mass job is skipped entirely (common for
    # symmetrized graphs — saves one job per iteration)
    dangling = verts.join(
        edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    n_dangling = dangling.count()

    n_iter = 0
    for it in range(max_iter):
        n_iter = it + 1
        if n_dangling:
            dmass_row = (
                ranks.join(dangling, "id", "left_semi")
                .agg(F.sum("rank").alias("m"))
                .first()
            )
            dmass = float(dmass_row["m"] or 0.0)
        else:
            dmass = 0.0

        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.id, "inner")
            .select(F.col("dst").alias("id"), (F.col("rank") * F.col("frac")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        base = (1.0 - d) / n + d * dmass / n
        new_ranks = (
            verts.join(contribs, "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(d) * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        new_ranks = new_ranks.transform(materialize)

        delta = None
        if tol > 0.0:  # fixed-iteration runs skip the convergence job
            delta_row = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "id")
                .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
                .first()
            )
            delta = float(delta_row["d"] or 0.0)
        old = ranks
        ranks = new_ranks
        old.unpersist()
        if checkpointer is not None and (it + 1) % checkpoint_interval == 0:
            ranks = checkpointer.save_state("pagerank_ranks", it, ranks)
        if delta is not None and delta < tol:
            break

    if checkpointer is not None:
        checkpointer.log_metric(op="pagerank", iters=n_iter, n=n)
    contrib_edges.unpersist()
    verts.unpersist()
    dangling.unpersist()
    return ranks
