"""PageRank on the directed edge table (SURVEY.md §3.3 P1).

Semantics (pinned for the 1e-6 parity gate, BASELINE.json north_rule):

    r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u)  +  dangling_mass/N )

- outdeg(u) = *count* of distinct out-edges (unweighted contribution
  split, the classic formulation); ``weighted=True`` splits by edge
  weight instead — contribution fraction = weight/out_w — the
  web-graph link-multiplicity variant.
- dangling_mass = Σ r(u) over vertices with no out-edges, redistributed
  uniformly — keeps Σ r = 1 exactly each iteration.
- convergence: max |r' - r| < tol (L∞), observed on the iteration job.

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
- **ONE Spark job, ONE post-scan shuffle per iteration**: the old rank
  state is unioned into the contribution aggregation as
  zero-contribution rows (old_rank/dang non-null exactly once per id),
  so there is no post-aggregation vertex join stage; the convergence
  delta (max |r'−r|) and the NEXT iteration's dynamic dangling mass
  (Σ r' over `dang` vertices) are `DataFrame.observe` metrics
  delivered by the materialize action itself — no separate
  dangling-sum or delta jobs (they used to make it 3 jobs/iteration,
  and per-iteration job-submission latency is exactly the serial floor
  the N→4N scaling efficiency divides by).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
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
    weighted: bool = False,
    leaf_cache: bool = True,
) -> DataFrame:
    """Return ranks(id long, rank double), Σ rank = 1.

    `weighted=True`: contributions split proportionally to edge weight
    (frac = weight/out_w) instead of uniformly (1/out_deg) — the
    web-graph variant where a page linked twice receives twice the
    mass.

    `checkpointer`: optional slmpy_spark.checkpoint.Checkpointer; when
    given, per-iteration state is persisted (resumable); otherwise
    localCheckpoint truncates lineage in-memory.

    `leaf_cache`: build the per-iteration contribution cache over a
    checkpoint leaf (constant-time per-iteration planning — the r4
    CacheManager-canonicalization fix, a measured win at ≥10M edges).
    False skips the leaf's fixed checkpoint job — the A/B toggle for
    small inputs (BENCH/ab_leaf_small.py).
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
        F.col("out_deg"),
        F.col("out_w"),
        F.coalesce(F.col("dyn"), F.lit(False)).alias("dyn"),
    )
    # contribution fraction: per-edge weight share (weighted) or the
    # uniform 1/out_deg split — both fixed across iterations
    frac_expr = (
        (F.col("weight") / F.col("out_w")) if weighted
        else (F.lit(1.0) / F.col("out_deg"))
    ).alias("frac")
    # The contribution base is a checkpoint LEAF, not a persist: the
    # per-iteration CacheManager lookup and AQE replanning canonicalize
    # contrib_edges' embedded plan every iteration, and with the raw
    # edge lineage embedded (edges appears three times via src_info)
    # that is ~1s/iteration of driver-side planning at any data size
    # (measured for the SLM sweep, BENCH/qe_stage_probe.py) — leafing
    # the base collapses it to scan-over-LogicalRDD.  The leaf must
    # outlive the cache built over it (evicted cache partitions
    # recompute from it, and checkpoint blocks have no lineage), so it
    # is freed at the end instead of right after cache population.
    _leaf = materialize if leaf_cache else (lambda f: f)
    if n_flat:
        contrib_leaf = _leaf(
            edges.join(src_info, "src").select("src", "dst", frac_expr, "dyn")
        )
        contrib_edges = (
            contrib_leaf.where("dyn")
            .select("src", "dst", "frac")
            .repartition(n_parts, "src")
            .persist()
        )
        contrib_edges.count()  # materialize
        flat_contrib = (
            contrib_leaf.where(~F.col("dyn"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("frac").alias("unit"))
            .transform(materialize)
        )
    else:
        # every vertex has in-edges → the aggregation output already
        # covers them all; no static split, same job count as the
        # plain formulation
        contrib_leaf = _leaf(
            edges.join(src_info, "src").select("src", "dst", frac_expr)
        )
        contrib_edges = contrib_leaf.repartition(n_parts, "src").persist()
        contrib_edges.count()
        flat_contrib = None

    # dangling (no OUT-edges) split into the dynamic part (has in-edges;
    # per-iteration sum over the ranks frame) and the static count of
    # isolated-ish vertices (no in, no out) whose rank is r_flat:
    # n_dangling_flat = (n − |has_out|) − n_dangling_dyn, no extra scan.
    has_out = edges.select(F.col("src").alias("id")).distinct().persist()
    n_out = has_out.count()
    dangling_dyn = has_in.join(has_out, "id", "left_anti")
    r_flat = 1.0 / n  # current rank of every no-in vertex

    # rank state carries a `dang` flag (dynamic vertex with no
    # out-edges) so each iteration's materialize job can OBSERVE the
    # next iteration's dynamic dangling mass — no per-iteration
    # dangling-sum job.  The initial dynamic dangling count rides the
    # init materialize the same way (all ranks equal 1/n, so the mass
    # is n_dangling_dyn / n).
    obs0 = Observation()
    ranks = (
        has_in.join(dangling_dyn.select("id", F.lit(1).alias("dang")), "id", "left")
        .select(
            "id",
            F.lit(1.0 / n).alias("rank"),
            F.coalesce("dang", F.lit(0)).alias("dang"),
        )
        .observe(obs0, F.sum("dang").alias("nd"))
        .transform(materialize)
    )
    n_dangling_dyn = int(obs0.get["nd"] or 0)
    n_dangling_flat = (n - n_out) - n_dangling_dyn
    has_out.unpersist()
    dmass_dyn = n_dangling_dyn / n

    n_iter = 0
    null_d = F.lit(None).cast("double")
    null_i = F.lit(None).cast("int")
    for it in range(max_iter):
        n_iter = it + 1
        dmass = n_dangling_flat * r_flat + dmass_dyn
        base = (1.0 - d) / n + d * dmass / n
        contribs = contrib_edges.join(
            ranks.select(F.col("id").alias("src"), "rank"), "src", "inner"
        ).select(
            F.col("dst").alias("id"),
            (F.col("rank") * F.col("frac")).alias("c"),
            null_d.alias("old_rank"),
            null_i.alias("dang"),
        )
        if n_flat:
            contribs = contribs.unionByName(
                flat_contrib.select(
                    "id",
                    (F.lit(r_flat) * F.col("unit")).alias("c"),
                    null_d.alias("old_rank"),
                    null_i.alias("dang"),
                )
            )
        # the old state rides INTO the aggregation as zero-contribution
        # rows (old_rank/dang are each non-null exactly once per id), so
        # the per-iteration plan is ONE edge-sized shuffle into the
        # groupBy — no post-aggregation vertex join stage at all; every
        # has-in vertex receives ≥1 contribution row by construction,
        # so the aggregation output IS the new rank set.  The
        # convergence delta and the next iteration's dynamic dangling
        # mass ride the SAME job as observed metrics.
        with_old = contribs.unionByName(
            ranks.select(
                "id",
                F.lit(0.0).alias("c"),
                F.col("rank").alias("old_rank"),
                F.col("dang"),
            )
        )
        agg = with_old.groupBy("id").agg(
            F.sum("c").alias("c"),
            F.max("old_rank").alias("old_rank"),
            F.max("dang").alias("dang"),
        )
        obs = Observation()
        new_ranks = (
            agg.select(
                "id",
                (F.lit(base) + F.lit(d) * F.col("c")).alias("rank"),
                "dang",
                "old_rank",
            )
            .observe(
                obs,
                F.max(F.abs(F.col("rank") - F.col("old_rank"))).alias("delta"),
                F.sum(
                    F.when(F.col("dang") == 1, F.col("rank")).otherwise(F.lit(0.0))
                ).alias("dmass"),
            )
            .select("id", "rank", "dang")
            .transform(materialize)
        )
        vals = obs.get
        delta = max(float(vals["delta"] or 0.0), abs(base - r_flat))
        dmass_dyn = float(vals["dmass"] or 0.0)
        old = ranks
        ranks = new_ranks
        r_flat = base
        old.unpersist()
        if checkpointer is not None and (it + 1) % checkpoint_interval == 0:
            reread = checkpointer.save_state("pagerank_ranks", it, ranks)
            ranks.unpersist()
            ranks = reread
        if tol > 0.0 and delta < tol:
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
    # after the cache built over it is gone; no-op when leaf_cache=False
    contrib_leaf.unpersist()
    has_in.unpersist()
    verts.unpersist()
    return out
