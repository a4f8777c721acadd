"""Smart Local Moving / Louvain over the edge table (SURVEY.md G4–G16).

Two execution modes (SURVEY.md §5.3):

- **exact**: the whole (small) graph flows into ONE ``applyInPandas``
  kernel that runs the sequential reference algorithm
  (kernels.run_slm) — bitwise-deterministic given a seed; used for the
  golden-fixture parity gate.

- **scale**: the distributed path for web-scale graphs.
  Per outer level:
    1. *distributed local moving*: edges are hash-partitioned by src
       (per-sweep rotating salt); each partition's kernel builds a CSR
       block and runs a sequential sweep against a *snapshot* of
       community totals (joined in as columns — the "broadcast/joined
       degree table" of the north star), emitting moves; community
       labels canonicalized to min-member-id between sweeps; a
       monotone-Q guard rejects sweeps that lower Q (stale-totals
       oscillation protection).
    2. *subnetwork splitting* (G6): intra-community edges grouped by
       community; ``applyInPandas`` runs LM-from-singletons per
       community — embarrassingly parallel.
    3. *aggregation* (G7/G8): join+groupBy builds the super-graph;
       subcommunities start the next level grouped by their parent.
    4. recurse until the super-graph stops shrinking; once it fits
       under ``exact_threshold`` edges the remaining levels run in the
       exact kernel (the graph has shrunk 100–10000× by then).
  Every outer level checkpoints assign + supergraph + metrics through
  the Checkpointer (resumable mid-convergence).

Scale-mode results match the reference's *Q-class* (same modularity to
1e-6 on graphs with stable optima), not its exact label sequence — the
sequential visit order is inherently unparallelizable (SURVEY §8-H1);
exact mode is the label-parity path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slmpy_spark.graph import kernels
from slmpy_spark.graph.aggregate import aggregate_graph
from slmpy_spark.graph.edges import degrees, symmetrize, total_weight, vertices
from slmpy_spark.graph.modularity import modularity
from slmpy_spark.util import materialize

ASSIGN_SCHEMA = "id long, community long"

import os as _os
import sys as _sys
import time as _time

def _dbg(msg: str) -> None:
    if _os.environ.get("SLMPY_DEBUG"):
        print(f"[slm {_time.strftime('%H:%M:%S')}] {msg}", file=_sys.stderr, flush=True)


# ------------------------------------------------------------- helpers


def _dense_run(pdf: pd.DataFrame, fn, **kw):
    """Remap arbitrary long ids to dense 0..n-1, run a kernels.* entry
    point, map back. Returns (ids, cluster, extra)."""
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    w = pdf["weight"].to_numpy(dtype=np.float64)
    ids = np.unique(np.concatenate([src, dst]))
    lsrc = np.searchsorted(ids, src)
    ldst = np.searchsorted(ids, dst)
    return ids, fn(len(ids), lsrc, ldst, w, **kw)


def _canonical_labels(assign: DataFrame) -> DataFrame:
    """community → min member vertex id (stable, collision-free labels
    across sweeps; also the scale-mode community id convention)."""
    m = assign.groupBy("community").agg(F.min("id").alias("rep"))
    return assign.join(m, "community").select("id", F.col("rep").alias("community"))


# ---------------------------------------------------------- exact mode


def slm_exact(
    edges: DataFrame,
    gamma: float = 1.0,
    quality: str = "modularity",
    n_random_starts: int = 1,
    n_iterations: int = 1,
    seed: int = 0,
    variant: str = "slm",
):
    """Sequential SLM/Louvain in one Arrow kernel. Returns (assign, q)."""
    sym = symmetrize(edges)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, (cluster, q) = _dense_run(
            pdf,
            kernels.run_slm,
            gamma=gamma,
            quality=quality,
            n_random_starts=n_random_starts,
            n_iterations=n_iterations,
            seed=seed,
            variant=variant,
        )
        return pd.DataFrame({"id": ids, "community": cluster, "q": q})

    out = (
        sym.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(kernel, "id long, community long, q double")
        .persist()
    )
    first = out.select("q").first()
    q = float(first["q"]) if first else 0.0
    assign = out.select("id", "community")
    return assign, q


# ------------------------------------------------- scale mode: LM sweep


def _lm_sweep_kernel_factory(
    resolution2: float, seed: int, sweep: int, move_frac: float = 1.0
):
    """Kernel for one distributed LM superstep. Input rows (one per
    directed edge of the partition's src nodes):
        src, dst, weight, c_src, c_dst, w_src, sigma_src, sigma_dst
    Output: (id, community) — post-sweep assignment for every local src.

    `move_frac`: fraction of nodes allowed to move this sweep
    (deterministic per (id, sweep) hash).  Damps the stale-totals
    overshoot of synchronous distributed local moving — without it,
    every node bordering a hub community jumps in simultaneously
    (the sequential reference would admit a few, update Σtot, and stop).
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                {"id": pd.Series(dtype="int64"), "community": pd.Series(dtype="int64")}
            )
        pdf = pdf.sort_values("src", kind="stable")
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        wgt = pdf["weight"].to_numpy(np.float64)
        c_dst = pdf["c_dst"].to_numpy(np.int64)
        c_src_rows = pdf["c_src"].to_numpy(np.int64)

        uniq_src, first_idx = np.unique(src, return_index=True)
        n_local = uniq_src.size
        counts = np.diff(np.append(first_idx, src.size))
        row_src = np.repeat(np.arange(n_local), counts)  # local src idx per row
        w_node = pdf["w_src"].to_numpy(np.float64)[first_idx]
        c_node = c_src_rows[first_idx]

        # dense local community universe: snapshot communities plus one
        # fresh-singleton slot per local node (label -(id+1); ascending
        # universe order == ascending label order → tie-breaks stay
        # "lowest community id" under dense indices)
        singles = -(uniq_src + 1)
        universe = np.unique(np.concatenate([c_node, c_dst, singles]))

        def dense(a):
            return np.searchsorted(universe, a)

        sigma = np.zeros(universe.size)
        for c_arr, s_arr in (
            (c_src_rows, pdf["sigma_src"].to_numpy(np.float64)),
            (c_dst, pdf["sigma_dst"].to_numpy(np.float64)),
        ):
            cu, iu = np.unique(c_arr, return_index=True)
            sigma[dense(cu)] = s_arr[iu]

        cur = dense(c_node)  # live community (dense idx) per local node
        single_idx = dense(singles)
        cand_snap = dense(c_dst)  # per-row dst community, snapshot

        # rows whose dst is itself a local node use the LIVE community
        dst_pos = np.searchsorted(uniq_src, dst)
        dst_pos_c = np.minimum(dst_pos, n_local - 1)
        dst_is_local = uniq_src[dst_pos_c] == dst

        if move_frac < 1.0:
            h = (uniq_src * 2654435761 + sweep * 40503 + seed) % (1 << 32)
            can_move = (h / (1 << 32)) < move_frac
        else:
            can_move = np.ones(n_local, dtype=bool)

        # seeded random chunking: each chunk decides vectorized against
        # the σ/labels left by previous chunks — bounded staleness, the
        # vectorized stand-in for the reference's sequential visit order
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + sweep))
        order = rng.permutation(n_local)
        # small blocks need MANY small chunks (chunking IS the
        # sequentialism); big blocks cap at 64 for vectorization width
        n_chunks = int(min(n_local, max(16, min(64, n_local // 64 + 1))))
        chunk_of = np.empty(n_local, dtype=np.int64)
        chunk_of[order] = np.arange(n_local) * n_chunks // n_local
        row_chunk = chunk_of[row_src]
        row_order = np.argsort(row_chunk, kind="stable")
        chunk_counts = np.bincount(row_chunk, minlength=n_chunks)
        chunk_starts = np.concatenate([[0], np.cumsum(chunk_counts)])

        for k in range(n_chunks):
            rows = row_order[chunk_starts[k] : chunk_starts[k + 1]]
            nodes_k = np.flatnonzero((chunk_of == k) & can_move)
            if nodes_k.size == 0:
                continue
            rows = rows[can_move[row_src[rows]]]

            if rows.size:
                cand = np.where(
                    dst_is_local[rows], cur[dst_pos_c[rows]], cand_snap[rows]
                )
                s_loc = row_src[rows]
                o2 = np.lexsort((cand, s_loc))
                s2, c2, w2 = s_loc[o2], cand[o2], wgt[rows][o2]
                newseg = np.empty(s2.size, dtype=bool)
                newseg[0] = True
                newseg[1:] = (s2[1:] != s2[:-1]) | (c2[1:] != c2[:-1])
                seg_starts = np.flatnonzero(newseg)
                kic = np.add.reduceat(w2, seg_starts)
                seg_src, seg_cand = s2[seg_starts], c2[seg_starts]

                # σ with the mover itself removed when candidate == its
                # current community (the reference removes i first)
                sig_pair = sigma[seg_cand] - w_node[seg_src] * (
                    seg_cand == cur[seg_src]
                )
                gain = kic - w_node[seg_src] * sig_pair * resolution2

                src_newseg = np.empty(seg_src.size, dtype=bool)
                src_newseg[0] = True
                src_newseg[1:] = seg_src[1:] != seg_src[:-1]
                src_starts = np.flatnonzero(src_newseg)
                gmax = np.maximum.reduceat(gain, src_starts)
                seg_of_pair = np.cumsum(src_newseg) - 1
                is_max = gain == gmax[seg_of_pair]
                pair_idx = np.arange(gain.size)
                first_max = np.minimum.reduceat(
                    np.where(is_max, pair_idx, gain.size), src_starts
                )
                with_rows = seg_src[src_starts]  # local node ids w/ nbrs
                best_cand = seg_cand[first_max]
                new_c_rows = np.where(
                    gmax > 0.0, best_cand, single_idx[with_rows]
                )
            else:
                with_rows = np.empty(0, dtype=np.int64)
                new_c_rows = np.empty(0, dtype=np.int64)

            # chunk movers with no candidate rows → fresh singleton
            # (sequential semantics: no neighbors ⇒ no positive gain)
            norow = nodes_k[~np.isin(nodes_k, with_rows)]
            movers = np.concatenate([with_rows, norow])
            new_c = np.concatenate([new_c_rows, single_idx[norow]])

            np.subtract.at(sigma, cur[movers], w_node[movers])
            np.add.at(sigma, new_c, w_node[movers])
            cur[movers] = new_c

        return pd.DataFrame({"id": uniq_src, "community": universe[cur]})

    return kernel


def _sweep_stats(
    sym: DataFrame,
    node_w: DataFrame,
    old_assign: DataFrame,
    new_assign: DataFrame,
    two_m: float,
    gamma: float,
    quality: str,
    bcast: bool = False,
):
    """(q, n_moves) of `new_assign` in exactly two Spark jobs:
    one edge-side agg (intra weight), one vertex-side agg
    (Σ σ_tot² fused with the move count).  With `bcast`, the
    vertex-side frames are broadcast so the edge table never
    shuffles."""
    hint = F.broadcast if bcast else (lambda df: df)
    a_src = hint(
        new_assign.select(F.col("id").alias("src"), F.col("community").alias("cs"))
    )
    a_dst = hint(
        new_assign.select(F.col("id").alias("dst"), F.col("community").alias("cd"))
    )
    intra_row = (
        sym.join(a_src, "src")
        .join(a_dst, "dst")
        .agg(
            F.sum(F.when(F.col("cs") == F.col("cd"), F.col("weight")).otherwise(0.0))
            .alias("intra")
        )
        .first()
    )
    intra = float(intra_row["intra"] or 0.0)
    v = (
        new_assign.alias("n")
        .join(old_assign.select("id", F.col("community").alias("old_c")), "id")
        .join(node_w, "id")
        .groupBy("community")
        .agg(
            F.sum("node_w").alias("sigma"),
            F.sum(
                F.when(F.col("community") != F.col("old_c"), 1).otherwise(0)
            ).alias("mv"),
        )
        .agg(
            F.sum(F.col("sigma") * F.col("sigma")).alias("s2"),
            F.sum("mv").alias("moves"),
        )
        .first()
    )
    s2, n_moves = float(v["s2"] or 0.0), int(v["moves"] or 0)
    if two_m == 0:
        return 0.0, n_moves
    if quality == "cpm":
        q = (intra - gamma * s2) / two_m
    else:
        q = intra / two_m - gamma * s2 / (two_m * two_m)
    return q, n_moves


def _distributed_local_moving(
    sym: DataFrame,
    node_w: DataFrame,
    assign: DataFrame,
    resolution2: float,
    seed: int,
    max_sweeps: int,
    n_parts: int,
    gamma: float,
    quality: str,
    q_guard: bool,
    two_m: float,
    checkpointer=None,
    level: int = 0,
    bcast: bool = False,
) -> DataFrame:
    """Superstep local moving with adaptive damping.

    Each sweep proposes moves against a Σtot snapshot; the sweep is
    *accepted* only if Q improves (q_guard).  On rejection the mover
    fraction is halved and the sweep retried from the best assignment —
    this converges because damping shrinks the simultaneous-move set
    toward the sequential regime; on acceptance the fraction relaxes
    back up.  Stops at n_moves == 0, `max_sweeps`, or `patience`
    consecutive rejections.

    Per-sweep cost: kernel job (checkpoint) + 2 stats jobs — the sweep
    stats (Q + move count) are fused into single passes (edge-side and
    vertex-side) so driver-loop latency stays bounded."""
    assign = assign.transform(materialize)
    best_q, _ = _sweep_stats(
        sym, node_w, assign, assign, two_m, gamma, quality, bcast=bcast
    )
    move_frac = 1.0
    patience = 4
    stall = 0
    owned = [assign]  # checkpoints created here, for unpersist hygiene

    for sweep in range(max_sweeps):
        comm_tot = (
            node_w.join(assign, "id")
            .groupBy("community")
            .agg(F.sum("node_w").alias("sigma"))
        )
        # vertex-sized sides broadcast when they fit (the north star's
        # "broadcast/joined degree table"): the 2m-row edge table then
        # never shuffles — one scan + map-side joins + the pkey shuffle
        hint = F.broadcast if bcast else (lambda df: df)
        a_src = hint(assign.select(F.col("id").alias("src"), F.col("community").alias("c_src")))
        a_dst = hint(assign.select(F.col("id").alias("dst"), F.col("community").alias("c_dst")))
        nw_src = hint(node_w.select(F.col("id").alias("src"), F.col("node_w").alias("w_src")))
        t_src = hint(comm_tot.select(F.col("community").alias("c_src"), F.col("sigma").alias("sigma_src")))
        t_dst = hint(comm_tot.select(F.col("community").alias("c_dst"), F.col("sigma").alias("sigma_dst")))

        rows = (
            sym.join(a_src, "src")
            .join(a_dst, "dst")
            .join(nw_src, "src")
            .join(t_src, "c_src")
            .join(t_dst, "c_dst")
            .withColumn(
                "pkey",
                F.pmod(F.xxhash64("src", F.lit(seed * 97 + sweep)), F.lit(n_parts)),
            )
        )
        if _os.environ.get("SLMPY_DEBUG"):
            _dbg(
                f"sweep {sweep} frac={move_frac} plansizes rows="
                f"{len(rows._jdf.queryExecution().analyzed().treeString())} "
                f"assign={len(assign._jdf.queryExecution().analyzed().treeString())} "
                f"kernel start"
            )
        moved = rows.groupBy("pkey").applyInPandas(
            _lm_sweep_kernel_factory(resolution2, seed, sweep, move_frac),
            ASSIGN_SCHEMA,
        )
        # isolated vertices (absent from sym) keep their assignment
        new_assign = (
            assign.alias("o")
            .join(moved.alias("m"), "id", "left")
            .select(
                "id",
                F.coalesce(F.col("m.community"), F.col("o.community")).alias("community"),
            )
        )
        # labels stay OPAQUE during sweeps — canonicalizing here would
        # erase concurrent moves (node j joins community "c" while c's
        # min member departs → relabel renames the group and j's join
        # evaporates).  Canonical min-member-id labels are applied once
        # after convergence.
        new_assign = new_assign.transform(materialize)
        _dbg(f"sweep {sweep} checkpointed; stats...")

        q, n_moves = _sweep_stats(
            sym, node_w, assign, new_assign, two_m, gamma, quality, bcast=bcast
        )
        _dbg(f"sweep {sweep} q={q:.6f} moves={n_moves}")
        if checkpointer is not None:
            checkpointer.log_metric(
                op="slm_sweep", level=level, sweep=sweep, q=q,
                n_moves=n_moves, move_frac=move_frac, n_partitions=n_parts,
            )
        if n_moves == 0:
            new_assign.unpersist()
            break
        if q_guard:
            if q <= best_q + 1e-12:
                stall += 1
                move_frac = max(0.125, move_frac / 2)  # damp; retry from best
                new_assign.unpersist()
                if stall >= patience:
                    break
                continue
            best_q = q
            stall = 0
            move_frac = min(1.0, move_frac * 1.5)
        assign = new_assign
        owned.append(assign)
    assign_out = _canonical_labels(assign).transform(materialize)
    for df in owned:
        if df is not assign_out:
            df.unpersist()
    return assign_out


# ----------------------------------------- scale mode: community split


def _split_kernel_factory(resolution2: float, seed: int):
    """LM-from-singletons inside one community (G6). Input rows: the
    community's intra edges (src, dst, weight, w_src). Output:
    (id, sub) with sub = local subcluster index."""

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        comm = int(key[0])
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        w = pdf["weight"].to_numpy(np.float64)
        ids = np.unique(np.concatenate([src, dst]))
        lsrc = np.searchsorted(ids, src)
        ldst = np.searchsorted(ids, dst)
        indptr, nbr, wgt = kernels.build_csr(len(ids), lsrc, ldst, w)
        nw_map = dict(zip(src.tolist(), pdf["w_src"].to_numpy(np.float64).tolist()))
        node_w = np.array([nw_map.get(int(i), 0.0) for i in ids])
        cluster = np.arange(len(ids), dtype=np.int64)
        rng = np.random.Generator(np.random.PCG64(seed ^ (comm * 2_654_435_761 % (1 << 63))))
        # sequential kernel for small communities (cheap, closest to
        # the reference); chunked vectorized kernel for big ones
        # (a power-law hub community can hold most of the graph — a
        # per-node Python loop there would serialize the whole stage)
        if len(ids) <= 4096:
            kernels.local_moving(indptr, nbr, wgt, node_w, cluster, resolution2, rng)
        else:
            kernels.local_moving_chunked(
                indptr, nbr, wgt, node_w, cluster, resolution2, rng
            )
        return pd.DataFrame({"id": ids, "sub": cluster})

    return kernel


def _split_communities(
    sym: DataFrame,
    node_w: DataFrame,
    assign: DataFrame,
    resolution2: float,
    seed: int,
    bcast: bool = False,
) -> DataFrame:
    """Re-cluster every community from singletons (may split it).
    New community labels = min member vertex id per subcommunity.
    Members without intra-community edges become singletons (exactly
    the sequential semantics: no neighbors in subnetwork → no positive
    gain → stays alone)."""
    hint = F.broadcast if bcast else (lambda df: df)
    a_src = hint(assign.select(F.col("id").alias("src"), F.col("community").alias("c_src")))
    a_dst = hint(assign.select(F.col("id").alias("dst"), F.col("community").alias("c_dst")))
    nw_src = hint(node_w.select(F.col("id").alias("src"), F.col("node_w").alias("w_src")))
    intra = (
        sym.join(a_src, "src")
        .join(a_dst, "dst")
        .where(F.col("c_src") == F.col("c_dst"))
        .join(nw_src, "src")
        .select("src", "dst", "weight", "w_src", F.col("c_src").alias("community"))
    )
    sub = intra.groupBy("community").applyInPandas(
        _split_kernel_factory(resolution2, seed), "id long, sub long"
    )
    # globally-unique subcommunity label = min member id (no driver coordination)
    sub_assign = sub.join(
        assign.select("id", F.col("community").alias("parent")), "id"
    )
    label = (
        sub_assign.groupBy("parent", "sub").agg(F.min("id").alias("new_c"))
    )
    relabeled = sub_assign.join(label, ["parent", "sub"]).select(
        "id", F.col("new_c").alias("community")
    )
    # nodes that had no intra edges → singleton of their own id
    out = (
        assign.alias("o")
        .join(relabeled.alias("r"), "id", "left")
        .select("id", F.coalesce(F.col("r.community"), F.col("id")).alias("community"))
    )
    # parent map (subcommunity → step-a parent community) — the SLM
    # §1.2(4c) warm start for the next level's initial clustering
    parent_map = (
        out.join(assign.select("id", F.col("community").alias("parent")), "id")
        .select(F.col("community").alias("id"), F.col("parent").alias("community"))
        .distinct()
    )
    return out, parent_map


# ---------------------------------------------------------- scale mode


def slm_scale(
    edges: DataFrame,
    gamma: float = 1.0,
    quality: str = "modularity",
    seed: int = 0,
    max_levels: int = 12,
    max_sweeps: int = 12,
    n_parts: int | None = None,
    exact_threshold: int = 200_000,
    q_guard: bool = True,
    checkpointer=None,
    variant: str = "slm",
    resume: bool = False,
    n_iterations: int = 1,
    broadcast_threshold: int = 20_000_000,
):
    """Distributed SLM (variant="slm") / Louvain (variant="louvain").
    Returns (assign, q) — q computed on the original graph.

    `n_iterations`: iterated SLM (G14) — each pass restarts the level
    hierarchy from the previous pass's flat assignment (never from
    singletons), monotonically refining Q; stops early when a pass
    stops improving.

    With a `checkpointer`, every completed level persists the triple
    (slm_assign flat labels, slm_supergraph, slm_node_w); passing
    `resume=True` with a checkpointer holding the same run_id restarts
    the level loop after the last completed level — the
    "resumable mid-convergence" contract.  Per-level seeds are
    `seed + level`, so a resumed run replays the remaining levels
    exactly as the uninterrupted one would."""
    spark = edges.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism

    sym0 = symmetrize(edges).persist()
    two_m = total_weight(sym0)
    if quality == "cpm":
        resolution2 = gamma
        nw0 = vertices(edges).select("id", F.lit(1.0).alias("node_w"))
    else:
        resolution2 = gamma / two_m if two_m else 0.0
        nw0 = degrees(sym0).select("id", F.col("w_deg").alias("node_w"))
    nw0 = nw0.transform(materialize)

    flat = None
    best_q = None
    for it in range(max(1, n_iterations)):
        flat = _scale_pass(
            sym0, nw0, two_m, resolution2, gamma, quality,
            seed + 7919 * it, max_levels, max_sweeps, n_parts,
            exact_threshold, q_guard, variant, checkpointer,
            step_offset=it * max_levels, init_flat=flat,
            resume=(resume and it == 0),
            broadcast_threshold=broadcast_threshold,
        )
        q = modularity(sym0, flat, gamma=gamma, quality=quality)
        if best_q is not None and q <= best_q + 1e-9:
            break
        best_q = q

    sym0.unpersist()
    return flat.select("id", "community"), best_q if best_q is not None else q


def _scale_pass(
    sym0, nw0, two_m, resolution2, gamma, quality, seed, max_levels,
    max_sweeps, n_parts, exact_threshold, q_guard, variant,
    checkpointer, step_offset, init_flat, resume,
    broadcast_threshold=20_000_000,
):
    """One full SLM/Louvain hierarchy pass (level loop). Returns the
    flat original-vertex → community assignment."""
    sym_l = sym0
    node_w_l = nw0
    # level-0 initial clustering: previous pass's result, or singletons
    assign_l = (
        init_flat
        if init_flat is not None
        else node_w_l.select("id", F.col("id").alias("community"))
    )
    flat = None  # original-vertex → current-level community
    level_start = 0

    if resume and checkpointer is not None:
        k = checkpointer.latest_step("slm_supergraph")
        if k is not None:
            level_start = k + 1 - step_offset
            sym_l = checkpointer.load_state("slm_supergraph", k).persist()
            node_w_l = checkpointer.load_state("slm_node_w", k)
            flat = checkpointer.load_state("slm_assign", k)
            assign_l = node_w_l.select("id", F.col("id").alias("community"))

    for level in range(level_start, max_levels):
        m_l = sym_l.count()
        _dbg(f"level {level}: m={m_l}")
        if m_l <= exact_threshold:
            _dbg(f"level {level}: exact finish (m={m_l})")
            assign_l = _exact_finish(
                sym_l, node_w_l, assign_l, resolution2, seed + level, variant
            )
            _dbg(f"level {level}: exact finish done")
            flat = assign_l if flat is None else _merge_down(flat, assign_l)
            break

        lm_parts = max(1, min(n_parts, m_l // 50_000))
        assign_l = _distributed_local_moving(
            sym_l, node_w_l, assign_l, resolution2, seed + level, max_sweeps,
            lm_parts, gamma, quality, q_guard, two_m,
            checkpointer=checkpointer, level=level,
        )
        _dbg(f"level {level}: LM done, splitting")
        parent_map = None
        if variant == "slm":
            assign_l, parent_map = _split_communities(
                sym_l, node_w_l, assign_l, resolution2, seed + level
            )
            assign_l = assign_l.transform(materialize)

        prev_flat = flat
        flat = assign_l if flat is None else _merge_down(flat, assign_l)
        if prev_flat is not None and prev_flat is not flat:
            prev_flat.unpersist()

        _dbg(f"level {level}: split done, counting")
        counts = assign_l.agg(
            F.count("*").alias("nv"), F.countDistinct("community").alias("nc")
        ).first()
        n_vertices, n_comms = int(counts["nv"]), int(counts["nc"])
        if n_comms >= n_vertices:
            break  # nothing merged at this level → converged

        super_edges, _sw = aggregate_graph(sym_l, assign_l)
        node_w_next = (
            node_w_l.join(assign_l, "id")
            .groupBy("community")
            .agg(F.sum("node_w").alias("node_w"))
            .select(F.col("community").alias("id"), "node_w")
        )
        old_sym = sym_l
        sym_l = super_edges.transform(materialize)
        if old_sym is not sym0:
            old_sym.unpersist()
        node_w_l = node_w_next.transform(materialize)
        # next level's initial clustering: SLM groups subcommunities by
        # their step-a parent (§1.2(4c) warm start); Louvain starts
        # from singleton super-nodes
        _dbg(f"level {level}: aggregated, nv/nc={n_vertices}/{n_comms}")
        if parent_map is not None:
            assign_l = parent_map.transform(materialize)
        else:
            assign_l = node_w_l.select("id", F.col("id").alias("community"))
        if checkpointer is not None:
            # complete level snapshot: (flat labels, supergraph, node
            # weights) — everything `resume` needs to restart here
            step = step_offset + level
            flat = checkpointer.save_state("slm_assign", step, flat)
            checkpointer.save_state("slm_node_w", step, node_w_l)
            checkpointer.save_state("slm_supergraph", step, sym_l)
            checkpointer.log_metric(
                op="slm", level=level, step=step, edges=m_l, communities=n_comms
            )

    if sym_l is not sym0:
        sym_l.unpersist()
    return flat


def _merge_down(flat: DataFrame, level_assign: DataFrame) -> DataFrame:
    """flat: orig_id → comm_k;  level_assign: comm_k → comm_{k+1}."""
    r = level_assign.select(
        F.col("id").alias("community"), F.col("community").alias("new_c")
    )
    out = flat.join(r, "community").select("id", F.col("new_c").alias("community"))
    return out.transform(materialize)


def _exact_finish(sym_l, node_w_l, assign_l, resolution2, seed, variant):
    """Collect the (now small) super-graph and run the sequential kernel
    to convergence, starting from the current assignment."""
    pdf = sym_l.toPandas()
    nw = node_w_l.toPandas()
    a = assign_l.toPandas()
    spark = sym_l.sparkSession
    if pdf.empty:
        return assign_l

    ids = np.unique(
        np.concatenate(
            [pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64),
             a["id"].to_numpy(np.int64)]
        )
    )
    lsrc = np.searchsorted(ids, pdf["src"].to_numpy(np.int64))
    ldst = np.searchsorted(ids, pdf["dst"].to_numpy(np.int64))
    indptr, nbr, wgt = kernels.build_csr(len(ids), lsrc, ldst, pdf["weight"].to_numpy(np.float64))

    node_w = np.zeros(len(ids))
    node_w[np.searchsorted(ids, nw["id"].to_numpy(np.int64))] = nw["node_w"].to_numpy(np.float64)

    cluster = np.empty(len(ids), dtype=np.int64)
    cluster[np.searchsorted(ids, a["id"].to_numpy(np.int64))] = a["community"].to_numpy(np.int64)
    # densify community labels
    kernels.compactify(cluster)

    rng = np.random.Generator(np.random.PCG64(seed))
    step = kernels.slm_recursive if variant == "slm" else kernels.louvain_recursive
    for _ in range(32):
        if not step(indptr, nbr, wgt, node_w, cluster, resolution2, rng):
            break
    out = pd.DataFrame({"id": ids, "community": cluster})
    # canonical min-member-id labels to stay in the global convention
    rep = out.groupby("community")["id"].transform("min")
    out["community"] = rep
    return spark.createDataFrame(out[["id", "community"]], ASSIGN_SCHEMA)


# -------------------------------------------------------------- facade


def slm(
    edges: DataFrame,
    gamma: float = 1.0,
    quality: str = "modularity",
    n_random_starts: int = 1,
    n_iterations: int = 1,
    seed: int = 0,
    mode: str = "auto",
    variant: str = "slm",
    exact_threshold: int = 200_000,
    checkpointer=None,
    **scale_kw,
):
    """Community detection entry point. Returns (assign_df, q).

    mode: "exact" | "scale" | "auto" (exact when the graph is under
    `exact_threshold` directed-pair entries)."""
    if mode == "auto":
        m = edges.count()
        mode = "exact" if 2 * m <= exact_threshold else "scale"
    if mode == "exact":
        return slm_exact(
            edges,
            gamma=gamma,
            quality=quality,
            n_random_starts=n_random_starts,
            n_iterations=n_iterations,
            seed=seed,
            variant=variant,
        )
    return slm_scale(
        edges,
        gamma=gamma,
        quality=quality,
        seed=seed,
        exact_threshold=exact_threshold,
        checkpointer=checkpointer,
        variant=variant,
        **scale_kw,
    )
