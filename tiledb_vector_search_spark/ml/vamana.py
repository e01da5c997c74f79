"""Vamana (DiskANN-family) graph kernels: build, greedy search, medoid.

Reference: ``src/include/index/vamana_index.h`` — ``medoid`` (:70-100),
graph build ``train`` (:322-412, greedy_search + robust_prune over a mutable
graph), query ``:500-560``; C++ search kernels
``detail/graph/greedy_search.h:286-491`` / ``best_first.h:136-230``.

These kernels run INSIDE a ``mapInPandas`` task on one shard of vectors
(SURVEY §7: graph ANN is sequential-iterative, fundamentally not
DataFrame-shaped; the Spark-idiomatic compromise — consistent with DiskANN's
own sharded design — is per-partition graphs built and searched locally,
with routing + merge as DataFrame ops).  Everything here is plain numpy on
matrices that fit one task comfortably (shards are IVF-partition sized).
"""

from __future__ import annotations

import numpy as np

DEFAULT_R_MAX = 32  # max out-degree (reference R default)
DEFAULT_L_BUILD = 64  # build beam width
DEFAULT_ALPHA = 1.2  # robust-prune distance slack


def medoid_index(x: np.ndarray) -> int:
    """argmin_v Σ_u ‖v−u‖² — the graph entry point (reference
    ``vamana_index.h:70-100``).  O(n²·d) via the BLAS identity; shards are
    bounded so this is a per-task micro-cost."""
    sq = np.sum(x * x, axis=1)
    # Σ_u ‖v−u‖² = n·‖v‖² + Σ‖u‖² − 2·v·Σu
    totals = len(x) * sq + sq.sum() - 2.0 * (x @ x.sum(axis=0))
    return int(np.argmin(totals))


def _greedy_search(
    x: np.ndarray,
    adj: list[np.ndarray],
    entry: int,
    q: np.ndarray,
    l_size: int,
    x_sq: np.ndarray | None = None,
    dq: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Best-first walk: returns (candidate ids sorted by distance, their
    distances) over all VISITED vertices (the robust-prune candidate pool).

    Reference ``greedy_search`` (``greedy_search.h:286-491``): maintain a
    beam of the best ``l_size`` vertices; repeatedly expand the closest
    unexpanded one.  Vectorized: vertex-indexed bitmaps for membership /
    expansion, BLAS-identity distances (``x_sq`` precomputable per shard —
    the build loop runs this once per vertex, so per-call python cost is
    the build's hot path).  ``dq`` (optional): the full distance row from
    ``q`` to every shard vector — the graph BUILD precomputes the shard's
    pairwise matrix once, turning every expansion's gather+GEMV into a
    plain gather.
    """
    if dq is None:
        if x_sq is None:
            x_sq = np.einsum("ij,ij->i", x, x)
        qq = float(q @ q)
        # clamp: the BLAS identity rounds exact matches to ~-1e-16, and
        # the L2 surface applies sqrt downstream — an unclamped negative
        # becomes NaN, which Spark sorts LAST, dropping the true nearest
        # neighbor from top-k on self-retrieval
        entry_d = max(x_sq[entry] - 2.0 * float(x[entry] @ q) + qq, 0.0)
    else:
        entry_d = dq[entry]
    beam_ids = np.array([entry], dtype=np.int64)
    beam_d = np.array([entry_d])
    # working copy with expanded positions inf'd out: argmin over it IS
    # "first minimum among unexpanded" — saves a gather+where per expansion
    beam_m = beam_d.copy()
    in_beam = np.zeros(len(x), dtype=bool)
    expanded = np.zeros(len(x), dtype=bool)
    in_beam[entry] = True
    visited_ids: list[int] = []
    visited_d: list[float] = []
    while True:
        # first-minimum over beam positions == the reference's scan order
        b = int(np.argmin(beam_m))
        if beam_m[b] == np.inf:
            break
        v = int(beam_ids[b])
        beam_m[b] = np.inf
        expanded[v] = True
        visited_ids.append(v)
        visited_d.append(float(beam_d[b]))
        nbrs = adj[v]
        nbrs = nbrs[~in_beam[nbrs]]
        if nbrs.size:
            if dq is None:
                nd = x_sq[nbrs] - 2.0 * (x[nbrs] @ q) + qq
                np.maximum(nd, 0.0, out=nd)
            else:
                nd = dq[nbrs]
            in_beam[nbrs] = True
            beam_ids = np.concatenate([beam_ids, nbrs])
            beam_d = np.concatenate([beam_d, nd])
            # a trimmed-then-reinserted vertex that was already expanded
            # must stay masked or it would be expanded (and visited) twice
            beam_m = np.concatenate(
                [beam_m, np.where(expanded[nbrs], np.inf, nd)]
            )
        if beam_ids.size > l_size:
            # keep the best l_size IN ORIGINAL BEAM ORDER (stable ties),
            # matching the reference's positional trim
            keep = np.sort(np.argsort(beam_d, kind="stable")[:l_size])
            drop_mask = np.ones(beam_ids.size, dtype=bool)
            drop_mask[keep] = False
            in_beam[beam_ids[drop_mask]] = False
            beam_ids = beam_ids[keep]
            beam_d = beam_d[keep]
            beam_m = beam_m[keep]
    order = np.argsort(np.array(visited_d), kind="stable")
    vi = np.array(visited_ids, dtype=np.int64)[order]
    vd = np.array(visited_d)[order]
    return vi, vd


def _robust_prune(
    x: np.ndarray,
    p: int,
    candidates: np.ndarray,
    alpha: float,
    r_max: int,
    dmat: np.ndarray | None = None,
) -> np.ndarray:
    """Diversity-preserving neighbor selection (reference ``robust_prune``,
    ``vamana_index.h`` build path): greedily keep the closest candidate,
    drop any other candidate that is α-dominated by it.  ``dmat``: the
    shard's precomputed pairwise squared-distance matrix (build path) —
    distance math becomes gathers."""
    cand = np.asarray(candidates, dtype=np.int64)
    cand = cand[cand != p]
    if cand.size == 0:
        return np.empty(0, dtype=np.int64)
    if dmat is None:
        diff = x[cand] - x[p]
        cd = np.einsum("ij,ij->i", diff, diff)
    else:
        cd = dmat[p, cand]
    order = np.argsort(cd, kind="stable")
    cand = cand[order]
    cd = cd[order]
    c = cand.size
    # candidate×candidate distances up front (one gather / one small GEMM):
    # the domination loop is then ONE vectorized mask op per kept point —
    # this prune runs ~r_max times per vertex (reverse edges), so per-call
    # overhead is the build's second hot path after the walk
    if dmat is None:
        cx = x[cand]
        csq = np.einsum("ij,ij->i", cx, cx)
        cc = csq[:, None] + csq[None, :] - 2.0 * (cx @ cx.T)
    else:
        cc = dmat[np.ix_(cand, cand)]
    alive = np.ones(c, dtype=bool)
    out_mask = np.zeros(c, dtype=bool)
    kept = 0
    for i in range(c):
        if not alive[i]:
            continue
        out_mask[i] = True
        kept += 1
        if kept >= r_max:
            break
        # keep only candidates NOT α-dominated by the newly kept point
        # (cc[i, i] = 0 retires i itself; dead entries stay dead)
        alive &= alpha * cc[i] > cd
    return cand[out_mask]


# shards up to this size precompute the pairwise squared-distance matrix
# (float64 n² — 128 MB at 4096, the default shard target) so every build
# step's distance math is a gather instead of a gather+GEMV; beyond it the
# build falls back to on-the-fly BLAS rows to bound task memory
PRECOMPUTE_PAIRWISE_MAX = 4096


def build_vamana_graph(
    x: np.ndarray,
    r_max: int = DEFAULT_R_MAX,
    l_build: int = DEFAULT_L_BUILD,
    alpha: float = DEFAULT_ALPHA,
    seed: int = 42,
) -> tuple[list[np.ndarray], int]:
    """Build the graph for one shard: returns (adjacency lists, medoid).

    Reference ``train`` (``vamana_index.h:322-412``): random initial graph,
    then one pass of greedy_search + robust_prune per vertex with reverse
    edges (re-pruned when over degree).
    """
    n = len(x)
    # degenerate shards happen naturally (a tiny k-means cell, a 1-row
    # corpus, post-delete consolidation) — guard BEFORE the random init,
    # whose rng.choice(n - 1 = 0, ...) would raise
    if n == 1:
        return [np.empty(0, dtype=np.int64)], 0
    rng = np.random.default_rng(seed)
    deg = min(r_max, max(1, n - 1))
    adj: list[np.ndarray] = []
    for i in range(n):
        nbrs = rng.choice(n - 1, size=deg, replace=False)
        nbrs = nbrs + (nbrs >= i)  # skip self
        adj.append(nbrs.astype(np.int64))
    med = medoid_index(x)
    x_sq = np.einsum("ij,ij->i", x, x)
    dmat = None
    if n <= PRECOMPUTE_PAIRWISE_MAX:
        dmat = x_sq[:, None] + x_sq[None, :] - 2.0 * (x @ x.T)
        np.maximum(dmat, 0.0, out=dmat)
    # deferred reverse-edge pruning (DiskANN's slack-bound insert): a
    # reverse edge only triggers a re-prune once the degree overflows
    # slack·r_max, cutting prune calls ~slack·r_max-fold on the build's
    # hottest path; the final pass restores the strict r_max bound
    slack = int(1.5 * r_max)
    for i in rng.permutation(n):
        dq = dmat[i] if dmat is not None else None
        visited, _ = _greedy_search(x, adj, med, x[i], l_build, x_sq=x_sq, dq=dq)
        pool = np.union1d(visited, adj[i])
        adj[i] = _robust_prune(x, int(i), pool, alpha, r_max, dmat=dmat)
        for j in adj[i]:
            if i in adj[j]:
                continue
            merged = np.append(adj[j], i)
            if len(merged) > slack:
                adj[j] = _robust_prune(x, int(j), merged, alpha, r_max, dmat=dmat)
            else:
                adj[j] = merged
    for j in range(n):
        if len(adj[j]) > r_max:
            adj[j] = _robust_prune(x, int(j), adj[j], alpha, r_max, dmat=dmat)
    return adj, med


def search_vamana_graph(
    x: np.ndarray,
    adj: list[np.ndarray],
    med: int,
    q: np.ndarray,
    k: int,
    l_search: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (positions, distances) for one query via best-first walk
    (reference ``query`` → ``best_first.h``)."""
    vi, vd = _greedy_search(x, adj, med, q, max(l_search, k))
    return vi[:k], vd[:k]
