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
  `edges` is cached once, PRE-HASH-PARTITIONED on the join key with the
  contribution factor precomputed — r is the only per-iteration change.
- **the iterated state holds only vertices with ≥1 in-edge.**  A vertex
  with no in-edges receives nothing, so its rank is the closed-form
  `base_t` every iteration; its *outgoing* contributions are a static
  per-dst table (Σ 1/outdeg over its no-in in-neighbors) scaled by the
  scalar `base_{t-1}` and unioned into the aggregation.  This removes
  the per-iteration `vertices ⋈ contribs` left join entirely — one
  fewer stage wave per iteration, and the shuffled state shrinks to
  the has-in subset (on web graphs a large cut: link farms / leaf
  pages have no in-links).
- lineage is truncated every iteration via localCheckpoint (or a
  Checkpointer) — without it Catalyst replans a k-join-deep tree at
  iteration k and driver planning time explodes.
- dangling mass and the convergence delta are single driver scalars per
  iteration, not collects of vertex data.
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

    # vertices with no IN-edges: their rank is the scalar `r_flat`
    # every iteration (they receive nothing), so they are dropped from
    # the iterated state; their outgoing mass enters the aggregation as
    # the static `flat_contrib` table scaled by r_flat.  The dyn flag
    # is attached to the VERTEX-sized out-degree table — the edge table
    # is scanned/joined once, split by a cached filter, never
    # semi-joined.
    has_in = edges.select(F.col("dst").alias("id")).distinct().persist()
    n_dyn = has_in.count()
    n_flat = n - n_dyn

    src_info = out_degrees(edges).join(
        has_in.select("id", F.lit(True).alias("dyn")), "id", "left"
    ).select(
        F.col("id").alias("src"),
        (F.lit(1.0) / F.col("out_deg")).alias("frac"),
        F.coalesce(F.col("dyn"), F.lit(False)).alias("dyn"),
    )
    if n_flat:
        all_contrib = edges.join(src_info, "src").select(
            "src", "dst", "frac", "dyn"
        ).persist()
        contrib_edges = (
            all_contrib.where("dyn")
            .select("src", "dst", "frac")
            .repartition(n_parts, "src")
            .persist()
        )
        contrib_edges.count()  # materialize
        flat_contrib = (
            all_contrib.where(~F.col("dyn"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("frac").alias("unit"))
            .persist()
        )
        flat_contrib.count()
        all_contrib.unpersist()
    else:
        # every vertex has in-edges → the aggregation output already
        # covers them all; no static split, same job count as the
        # plain formulation
        contrib_edges = (
            edges.join(src_info, "src")
            .select("src", "dst", "frac")
            .repartition(n_parts, "src")
            .persist()
        )
        contrib_edges.count()
        flat_contrib = None

    # dangling (no OUT-edges) split into the dynamic part (has in-edges;
    # per-iteration sum over the ranks frame) and the static count of
    # isolated-ish vertices (no in, no out) whose rank is r_flat:
    # n_dangling_flat = (n − |has_out|) − n_dangling_dyn, no extra scan.
    has_out = edges.select(F.col("src").alias("id")).distinct().persist()
    n_out = has_out.count()
    dangling_dyn = has_in.join(has_out, "id", "left_anti").persist()
    n_dangling_dyn = dangling_dyn.count()
    n_dangling_flat = (n - n_out) - n_dangling_dyn
    has_out.unpersist()
    r_flat = 1.0 / n  # current rank of every no-in vertex

    ranks = has_in.select("id", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.transform(materialize)

    n_iter = 0
    for it in range(max_iter):
        n_iter = it + 1
        if n_dangling_dyn or n_dangling_flat:
            dmass = n_dangling_flat * r_flat
            if n_dangling_dyn:
                dmass_row = (
                    ranks.join(dangling_dyn, "id", "left_semi")
                    .agg(F.sum("rank").alias("m"))
                    .first()
                )
                dmass += float(dmass_row["m"] or 0.0)
        else:
            dmass = 0.0

        base = (1.0 - d) / n + d * dmass / n
        contribs = contrib_edges.join(
            ranks, contrib_edges.src == ranks.id, "inner"
        ).select(F.col("dst").alias("id"), (F.col("rank") * F.col("frac")).alias("c"))
        if n_flat:
            contribs = contribs.unionByName(
                flat_contrib.select("id", (F.lit(r_flat) * F.col("unit")).alias("c"))
            )
        contribs = contribs.groupBy("id").agg(F.sum("c").alias("c"))
        # every has-in vertex receives ≥1 contribution row by
        # construction, so the aggregation output IS the new dynamic
        # rank set — no vertices left join
        new_ranks = contribs.select(
            "id", (F.lit(base) + F.lit(d) * F.col("c")).alias("rank")
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
            delta = max(float(delta_row["d"] or 0.0), abs(base - r_flat))
        old = ranks
        ranks = new_ranks
        r_flat = base
        old.unpersist()
        if checkpointer is not None and (it + 1) % checkpoint_interval == 0:
            ranks = checkpointer.save_state("pagerank_ranks", it, ranks)
        if delta is not None and delta < tol:
            break

    if checkpointer is not None:
        checkpointer.log_metric(op="pagerank", iters=n_iter, n=n)
    out = ranks.select("id", "rank")
    if n_flat:
        out = out.unionByName(
            verts.join(has_in, "id", "left_anti").select(
                "id", F.lit(r_flat).alias("rank")
            )
        )
    contrib_edges.unpersist()
    if flat_contrib is not None:
        flat_contrib.unpersist()
    has_in.unpersist()
    verts.unpersist()
    dangling_dyn.unpersist()
    return out
