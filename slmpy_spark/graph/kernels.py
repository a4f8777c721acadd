"""Numpy CSR kernels for local moving / SLM (SURVEY.md G4/G5/G12/G13).

These are the *worker-side* compute kernels. They re-implement, from
the published algorithm description (Waltman & van Eck, "A smart local
moving algorithm for large-scale modularity-based community detection",
EPJ B (2013) 86:471, arXiv:1308.6604) and the public Java
``ModularityOptimizer`` semantics, the sequential smart-local-moving
family.  Pinned semantics (SURVEY.md §1.1–1.2; re-verify against
/root/reference when it becomes readable — it is empty this sandbox):

- visit order: seeded random permutation per sweep;
- gain(i→c) = k_{i,c} − node_w_i · Σtot(c) · γ'   with γ' = γ/2m for
  standard modularity (node_w = weighted degree) or γ' = γ for CPM
  (node_w = 1); Σtot evaluated *after removing i from its community*;
- move only on strictly positive best gain; ties → lowest community id;
  no positive gain → node takes an unused (empty) community id
  (LIFO stack of unused ids, initially ascending);
- cyclic sweep with an unstable counter: terminate when n consecutive
  visits produce no move;
- cluster ids compactified after each LM run, preserving ascending
  first-use order.

Everything operates on CSR arrays (indptr, nbr, wgt) — contiguous,
cache-friendly, built per Arrow batch with O(m) numpy sorts.  Graphs
here are *symmetrized* and self-loop-free; self-loop weight created by
aggregation is carried as the scalar ``total_self_w`` (it shifts Q by a
constant and never affects a move decision).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- CSR


def build_csr(n: int, src: np.ndarray, dst: np.ndarray, wgt: np.ndarray):
    """CSR adjacency from a directed-pair edge list (both directions
    present for undirected graphs). Returns (indptr, nbr, w)."""
    src = np.asarray(src, dtype=np.int64)
    order = np.argsort(src, kind="stable")
    indptr = np.zeros(n + 1, dtype=np.int64)
    counts = np.bincount(src, minlength=n)
    indptr[1:] = np.cumsum(counts)
    return (
        indptr,
        np.asarray(dst, dtype=np.int64)[order],
        np.asarray(wgt, dtype=np.float64)[order],
    )


def compactify(cluster: np.ndarray) -> int:
    """Renumber cluster ids to 0..k-1 preserving ascending old-id order
    (the reference's end-of-LM relabel). In-place; returns k."""
    used = np.unique(cluster)
    remap = np.empty(int(used.max()) + 1 if used.size else 0, dtype=np.int64)
    remap[used] = np.arange(used.size, dtype=np.int64)
    cluster[:] = remap[cluster]
    return int(used.size)


# ------------------------------------------------------- local moving


def local_moving(
    indptr: np.ndarray,
    nbr: np.ndarray,
    wgt: np.ndarray,
    node_w: np.ndarray,
    cluster: np.ndarray,
    resolution2: float,
    rng: np.random.Generator,
) -> bool:
    """One full sequential local-moving pass (runs to stability).

    Mutates `cluster` in place; returns True iff any node moved.
    `resolution2` = γ/2m (standard) or γ (CPM); `node_w` = degree or 1s.
    """
    n = indptr.size - 1
    if n <= 1:
        return False
    # r6: the visit loop runs on plain-Python lists/dicts.  The per-visit
    # numpy path (fancy-index + unique + bincount + argmax on a ~degree-
    # sized slice) costs ~1 ms/visit in array-op constant overhead — the
    # measured 99%-serial straggler of the split stage.  Python scalar
    # float arithmetic is the same IEEE double as numpy float64, the kic
    # accumulation below adds weights in the identical (CSR-slice) order
    # bincount does, candidates are scanned in the same ascending order
    # np.unique yields, first-strict-max keeps the same lowest-id
    # tie-break, and the RNG stream is untouched — so the labels are
    # bit-identical to the r5 numpy loop at ~20× the visit rate
    # (verified by the kernel/fixture parity tests).
    cluster_w = np.bincount(cluster, weights=node_w, minlength=n).tolist()
    n_per_np = np.bincount(cluster, minlength=n)
    unused = np.flatnonzero(n_per_np == 0).tolist()  # ascending; pop() = largest
    n_per = n_per_np.tolist()
    indptr_l = indptr.tolist()
    nbr_l = nbr.tolist()
    wgt_l = wgt.tolist()
    nw_l = [float(x) for x in node_w]
    cl = cluster.tolist()

    order = rng.permutation(n).tolist()
    n_stable = 0
    i = 0
    update = False
    while n_stable < n:
        j = order[i]
        lo, hi = indptr_l[j], indptr_l[j + 1]
        cj = cl[j]
        w_j = nw_l[j]
        cluster_w[cj] -= w_j
        n_per[cj] -= 1
        if n_per[cj] == 0:
            unused.append(cj)

        best = -1
        if hi > lo:
            acc: dict = {}
            for t in range(lo, hi):
                c = cl[nbr_l[t]]
                acc[c] = acc.get(c, 0.0) + wgt_l[t]
            best_gain = 0.0
            for c in sorted(acc):
                # same op order as the numpy expression:
                # kic - (node_w[j] * cluster_w[c]) * resolution2
                g = acc[c] - w_j * cluster_w[c] * resolution2
                if g > best_gain:  # strict > keeps lowest id on ties
                    best_gain = g
                    best = c
        if best < 0:
            best = unused.pop()

        cluster_w[best] += w_j
        n_per[best] += 1
        if best == cj:
            n_stable += 1
        else:
            cl[j] = best
            n_stable = 1
            update = True
        i = i + 1 if i < n - 1 else 0

    cluster[:] = cl
    compactify(cluster)
    return update


def local_moving_chunked(
    indptr: np.ndarray,
    nbr: np.ndarray,
    wgt: np.ndarray,
    node_w: np.ndarray,
    cluster: np.ndarray,
    resolution2: float,
    rng: np.random.Generator,
    max_rounds: int = 16,
    n_chunks: int = 64,
) -> bool:
    """Vectorized local moving for *large* subgraphs (the distributed
    split kernel's hot path): rounds of seeded-random chunks, each chunk
    deciding moves vectorized (lexsort + reduceat) against σ totals
    updated between chunks.  Converges to the same Q-class as the
    sequential `local_moving` but is ~50× faster per node on big
    blocks; exact label-sequence parity is NOT preserved (exact mode
    keeps the sequential kernel).

    Singleton escapes use cluster slots n..2n-1 (slot n+j for node j);
    labels are compactified before returning.  Mutates `cluster`.
    """
    n = indptr.size - 1
    if n <= 1:
        return False
    row_src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    sigma = np.bincount(cluster, weights=node_w, minlength=2 * n).astype(np.float64)
    update = False

    two_m = float(wgt.sum())
    e_src = row_src  # alias for the intra-weight Q check

    def q_of(cl):
        intra = float(wgt[cl[e_src] == cl[nbr]].sum())
        tot = np.bincount(cl, weights=node_w)
        return intra - resolution2 * float(tot @ tot)  # monotone in Q

    best_cluster = cluster.copy()
    best_q = q_of(cluster)

    for _ in range(max_rounds):
        order = rng.permutation(n)
        # chunk count: small graphs need MANY small chunks (the chunks
        # are the sequentialism — one chunk = fully synchronous =
        # husband-wife oscillation); huge graphs cap at `n_chunks` for
        # vectorization width
        k_chunks = int(min(n, max(16, min(n_chunks, n // 64 + 1))))
        chunk_of = np.empty(n, dtype=np.int64)
        chunk_of[order] = np.arange(n, dtype=np.int64) * k_chunks // n
        row_chunk = chunk_of[row_src]
        row_order = np.argsort(row_chunk, kind="stable")
        counts = np.bincount(row_chunk, minlength=k_chunks)
        cstarts = np.concatenate([[0], np.cumsum(counts)])
        # chunk membership by slicing the permutation (chunk_of[order[t]]
        # = t*k/n is monotone in t), sorted ascending — the same array
        # flatnonzero(chunk_of == k) yields, without the O(n·k_chunks)
        # full rescans per round (r6; values bit-identical, and the
        # ascending order keeps the sigma np.add.at accumulation order —
        # and with it FP rounding — unchanged)
        ncounts = np.bincount(
            np.arange(n, dtype=np.int64) * k_chunks // n, minlength=k_chunks
        )
        nstarts = np.concatenate([[0], np.cumsum(ncounts)])
        order_np = np.asarray(order)

        moved_round = 0
        for k in range(k_chunks):
            rows = row_order[cstarts[k] : cstarts[k + 1]]
            nodes_k = np.sort(order_np[nstarts[k] : nstarts[k + 1]])
            if nodes_k.size == 0:
                continue
            if rows.size:
                cand = cluster[nbr[rows]]
                s_loc = row_src[rows]
                o2 = np.lexsort((cand, s_loc))
                s2, c2, w2 = s_loc[o2], cand[o2], wgt[rows][o2]
                newseg = np.empty(s2.size, dtype=bool)
                newseg[0] = True
                newseg[1:] = (s2[1:] != s2[:-1]) | (c2[1:] != c2[:-1])
                seg_starts = np.flatnonzero(newseg)
                kic = np.add.reduceat(w2, seg_starts)
                seg_src, seg_cand = s2[seg_starts], c2[seg_starts]
                sig_pair = sigma[seg_cand] - node_w[seg_src] * (
                    seg_cand == cluster[seg_src]
                )
                gain = kic - node_w[seg_src] * sig_pair * resolution2

                src_newseg = np.empty(seg_src.size, dtype=bool)
                src_newseg[0] = True
                src_newseg[1:] = seg_src[1:] != seg_src[:-1]
                src_starts = np.flatnonzero(src_newseg)
                gmax = np.maximum.reduceat(gain, src_starts)
                seg_of = np.cumsum(src_newseg) - 1
                is_max = gain == gmax[seg_of]
                first_max = np.minimum.reduceat(
                    np.where(is_max, np.arange(gain.size), gain.size), src_starts
                )
                with_rows = seg_src[src_starts]
                new_c_rows = np.where(
                    gmax > 0.0, seg_cand[first_max], n + with_rows
                )
            else:
                with_rows = np.empty(0, dtype=np.int64)
                new_c_rows = np.empty(0, dtype=np.int64)

            norow = nodes_k[~np.isin(nodes_k, with_rows)]
            movers = np.concatenate([with_rows, norow])
            new_c = np.concatenate([new_c_rows, n + norow])

            changed = new_c != cluster[movers]
            moved_round += int(changed.sum())
            np.subtract.at(sigma, cluster[movers], node_w[movers])
            np.add.at(sigma, new_c, node_w[movers])
            cluster[movers] = new_c
        if moved_round == 0:
            break
        q = q_of(cluster)
        if q > best_q + 1e-12:
            best_q = q
            best_cluster = cluster.copy()
            update = True
    cluster[:] = best_cluster  # reject oscillating tails, keep best-Q state
    compactify(cluster)
    return update


# --------------------------------------------- subnetworks & reduction


def _cluster_slices(cluster: np.ndarray, n_clusters: int):
    """Nodes grouped by cluster: returns (nodes_sorted, starts) where
    nodes_sorted[starts[c]:starts[c+1]] are cluster c's members,
    ascending."""
    order = np.argsort(cluster, kind="stable")
    starts = np.zeros(n_clusters + 1, dtype=np.int64)
    starts[1:] = np.cumsum(np.bincount(cluster, minlength=n_clusters))
    return order, starts


def _intra_edges_by_cluster(
    indptr, nbr, wgt, cluster, n_clusters
):
    """All intra-cluster directed pairs, sorted by cluster. Returns
    (e_src, e_dst, e_w, estarts) with estarts slicing per cluster."""
    n = indptr.size - 1
    e_src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    mask = cluster[e_src] == cluster[nbr]
    s, d, w = e_src[mask], nbr[mask], wgt[mask]
    c = cluster[s]
    order = np.argsort(c, kind="stable")
    s, d, w, c = s[order], d[order], w[order], c[order]
    estarts = np.zeros(n_clusters + 1, dtype=np.int64)
    estarts[1:] = np.cumsum(np.bincount(c, minlength=n_clusters))
    return s, d, w, estarts


def _reduced_network(indptr, nbr, wgt, node_w, cluster, n_clusters):
    """Aggregate to the super-graph: inter-cluster weights summed; the
    intra weight folds into the returned self-weight scalar; super node
    weights = member node-weight sums. Returns
    (r_indptr, r_nbr, r_wgt, r_node_w, intra_w_total)."""
    n = indptr.size - 1
    e_src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    cs, cd, w = cluster[e_src], cluster[nbr], wgt
    inter = cs != cd
    intra_w_total = float(w[~inter].sum())
    key = cs[inter].astype(np.int64) * n_clusters + cd[inter]
    uk, inv = np.unique(key, return_inverse=True)
    rw = np.bincount(inv, weights=w[inter])
    rs, rd = (uk // n_clusters), (uk % n_clusters)
    r_indptr, r_nbr, r_wgt = build_csr(n_clusters, rs, rd, rw)
    r_node_w = np.bincount(cluster, weights=node_w, minlength=n_clusters)
    return r_indptr, r_nbr, r_wgt, r_node_w, intra_w_total


# ------------------------------------------------------------- SLM


def _lm_auto(indptr, nbr, wgt, node_w, cluster, resolution2, rng) -> bool:
    """Sequential LM for small graphs (reference-faithful), chunked
    vectorized LM for big ones (the per-node Python visit loop is
    ~10³ nodes/s — minutes at 10⁵ nodes; the vectorized kernel is the
    same Q-class at ~10⁶ node-visits/s).  Used by scale-mode callers
    (exact label parity keeps the sequential kernel via run_slm)."""
    if indptr.size - 1 <= 4096:
        return local_moving(indptr, nbr, wgt, node_w, cluster, resolution2, rng)
    return local_moving_chunked(indptr, nbr, wgt, node_w, cluster, resolution2, rng)


def slm_recursive(
    indptr, nbr, wgt, node_w, cluster, resolution2, rng, fast: bool = False
) -> bool:
    """One SLM pass (recursive over aggregation levels), §1.2(4).

    a. local moving on the current network;
    b. split: per-community induced subnetwork, LM from singletons;
    c. reduced network over subcommunities, initially clustered by
       their step-a parent community;
    d. recurse; merge labels down.
    Mutates `cluster`; returns True iff anything changed.
    `fast=True` swaps the vectorized LM in above 4096 nodes (Q-class
    parity, used by the scale-mode exact finish).
    """
    n = indptr.size - 1
    if n == 1:
        return False
    lm = _lm_auto if fast else local_moving
    update = lm(indptr, nbr, wgt, node_w, cluster, resolution2, rng)
    n_clusters = int(cluster.max()) + 1 if n else 0
    if n_clusters >= n:
        return update

    nodes_sorted, starts = _cluster_slices(cluster, n_clusters)
    es, ed, ew, estarts = _intra_edges_by_cluster(indptr, nbr, wgt, cluster, n_clusters)

    glob2loc = np.empty(n, dtype=np.int64)
    new_cluster = np.empty(n, dtype=np.int64)
    n_sub = np.empty(n_clusters, dtype=np.int64)
    next_id = 0
    for c in range(n_clusters):
        members = nodes_sorted[starts[c] : starts[c + 1]]
        k = members.size
        glob2loc[members] = np.arange(k, dtype=np.int64)
        s = glob2loc[es[estarts[c] : estarts[c + 1]]]
        d = glob2loc[ed[estarts[c] : estarts[c + 1]]]
        w = ew[estarts[c] : estarts[c + 1]]
        sub_indptr, sub_nbr, sub_wgt = build_csr(k, s, d, w)
        sub_cluster = np.arange(k, dtype=np.int64)  # from singletons
        lm(
            sub_indptr, sub_nbr, sub_wgt, node_w[members], sub_cluster, resolution2, rng
        )
        kc = int(sub_cluster.max()) + 1 if k else 0
        new_cluster[members] = next_id + sub_cluster
        n_sub[c] = kc
        next_id += kc
    cluster[:] = new_cluster

    r = _reduced_network(indptr, nbr, wgt, node_w, cluster, next_id)
    r_indptr, r_nbr, r_wgt, r_node_w, _ = r
    # initial clustering of the reduced network: subcommunity → parent
    r_cluster = np.repeat(np.arange(n_clusters, dtype=np.int64), n_sub)
    update |= slm_recursive(
        r_indptr, r_nbr, r_wgt, r_node_w, r_cluster, resolution2, rng, fast=fast
    )
    cluster[:] = r_cluster[cluster]  # merge down (G9)
    compactify(cluster)
    return update


def louvain_recursive(
    indptr, nbr, wgt, node_w, cluster, resolution2, rng, refine: bool = False,
    fast: bool = False,
) -> bool:
    """Classic Louvain (§1.2(2)) / with multilevel refinement (§1.2(3)):
    LM → aggregate → recurse from singletons → merge down
    (→ optionally re-run LM at this level)."""
    n = indptr.size - 1
    if n == 1:
        return False
    lm = _lm_auto if fast else local_moving
    update = lm(indptr, nbr, wgt, node_w, cluster, resolution2, rng)
    n_clusters = int(cluster.max()) + 1 if n else 0
    if n_clusters < n:
        r_indptr, r_nbr, r_wgt, r_node_w, _ = _reduced_network(
            indptr, nbr, wgt, node_w, cluster, n_clusters
        )
        r_cluster = np.arange(n_clusters, dtype=np.int64)
        sub_update = louvain_recursive(
            r_indptr, r_nbr, r_wgt, r_node_w, r_cluster, resolution2, rng, refine,
            fast=fast,
        )
        if sub_update:
            update = True
            cluster[:] = r_cluster[cluster]
            if refine:
                update |= lm(
                    indptr, nbr, wgt, node_w, cluster, resolution2, rng
                )
        compactify(cluster)
    return update


# ------------------------------------------------------------ quality


def quality_numpy(
    indptr,
    nbr,
    wgt,
    node_w,
    cluster,
    gamma: float = 1.0,
    quality: str = "modularity",
    total_self_w: float = 0.0,
    two_m: float | None = None,
) -> float:
    """Q of a clustering on a CSR graph (§1.1). `two_m` lets callers pin
    the level-0 normalization when evaluating on reduced networks."""
    n = indptr.size - 1
    e_src = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    intra = float(wgt[cluster[e_src] == cluster[nbr]].sum()) + total_self_w
    if two_m is None:
        two_m = float(wgt.sum()) + total_self_w
    if two_m == 0:
        return 0.0
    if quality == "cpm":
        sizes = np.bincount(cluster)
        return (intra - gamma * float((sizes.astype(np.float64) ** 2).sum())) / two_m
    tot = np.bincount(cluster, weights=node_w)
    return intra / two_m - gamma * float((tot / two_m) @ (tot / two_m))


# --------------------------------------------------- iterated wrappers


def run_slm(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    wgt: np.ndarray,
    gamma: float = 1.0,
    quality: str = "modularity",
    n_random_starts: int = 1,
    n_iterations: int = 1,
    seed: int = 0,
    variant: str = "slm",
):
    """Complete iterated SLM/Louvain on a symmetrized directed-pair edge
    list with dense node ids 0..n-1 (G13/G14).  Returns (cluster, q).

    variant: "slm" | "louvain" | "louvain_refine".
    """
    indptr, nbr, w = build_csr(n, src, dst, wgt)
    if quality == "cpm":
        node_w = np.ones(n, dtype=np.float64)
        resolution2 = gamma
    else:
        node_w = np.zeros(n, dtype=np.float64)
        np.add.at(node_w, src, wgt)
        two_m = float(w.sum())
        resolution2 = gamma / two_m if two_m else 0.0

    step = {
        "slm": slm_recursive,
        "louvain": louvain_recursive,
        "louvain_refine": lambda *a: louvain_recursive(*a, refine=True),
    }[variant]

    best_cluster, best_q = None, -np.inf
    for start in range(max(1, n_random_starts)):
        rng = np.random.Generator(np.random.PCG64(seed + start))
        cluster = np.arange(n, dtype=np.int64)
        for _ in range(max(1, n_iterations)):
            changed = step(indptr, nbr, w, node_w, cluster, resolution2, rng)
            if not changed:
                break
        q = quality_numpy(indptr, nbr, w, node_w, cluster, gamma, quality)
        if q > best_q:
            best_q, best_cluster = q, cluster.copy()
    return best_cluster, float(best_q)
