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
) -> tuple[np.ndarray, np.ndarray]:
    """Best-first walk: returns (candidate ids sorted by distance, their
    distances) over all VISITED vertices (the robust-prune candidate pool).

    Reference ``greedy_search`` (``greedy_search.h:286-491``): maintain a
    beam of the best ``l_size`` vertices; repeatedly expand the closest
    unexpanded one.
    """
    d_entry = float(np.sum((x[entry] - q) ** 2))
    beam_ids = [entry]
    beam_d = [d_entry]
    expanded: set[int] = set()
    in_beam = {entry}
    visited_ids: list[int] = []
    visited_d: list[float] = []
    while True:
        best, best_d = -1, np.inf
        for i, v in enumerate(beam_ids):
            if v not in expanded and beam_d[i] < best_d:
                best, best_d = v, beam_d[i]
        if best < 0:
            break
        expanded.add(best)
        visited_ids.append(best)
        visited_d.append(best_d)
        nbrs = [v for v in adj[best] if v not in in_beam]
        if nbrs:
            nd = np.sum((x[nbrs] - q) ** 2, axis=1)
            for v, dv in zip(nbrs, nd):
                beam_ids.append(int(v))
                beam_d.append(float(dv))
                in_beam.add(int(v))
        if len(beam_ids) > l_size:
            order = np.argsort(np.array(beam_d), kind="stable")[:l_size]
            keep = set(int(o) for o in order)
            beam_ids = [beam_ids[i] for i in range(len(beam_ids)) if i in keep]
            beam_d = [beam_d[i] for i in range(len(beam_d)) if i in keep]
            in_beam = set(beam_ids)
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
) -> np.ndarray:
    """Diversity-preserving neighbor selection (reference ``robust_prune``,
    ``vamana_index.h`` build path): greedily keep the closest candidate,
    drop any other candidate that is α-dominated by it."""
    cand = [int(c) for c in candidates if c != p]
    if not cand:
        return np.empty(0, dtype=np.int64)
    cd = np.sum((x[cand] - x[p]) ** 2, axis=1)
    order = np.argsort(cd, kind="stable")
    cand = [cand[i] for i in order]
    cd = cd[order]
    out: list[int] = []
    alive = np.ones(len(cand), dtype=bool)
    for i in range(len(cand)):
        if not alive[i]:
            continue
        out.append(cand[i])
        if len(out) >= r_max:
            break
        # kill candidates α-dominated by the newly kept point
        dk = np.sum((x[cand] - x[cand[i]]) ** 2, axis=1)
        alive &= ~(alpha * dk <= cd)
        alive[i] = False
    return np.asarray(out, dtype=np.int64)


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
    rng = np.random.default_rng(seed)
    deg = min(r_max, max(1, n - 1))
    adj: list[np.ndarray] = []
    for i in range(n):
        nbrs = rng.choice(n - 1, size=deg, replace=False)
        nbrs = nbrs + (nbrs >= i)  # skip self
        adj.append(nbrs.astype(np.int64))
    if n == 1:
        return [np.empty(0, dtype=np.int64)], 0
    med = medoid_index(x)
    for i in rng.permutation(n):
        visited, _ = _greedy_search(x, adj, med, x[i], l_build)
        pool = np.union1d(visited, adj[i])
        adj[i] = _robust_prune(x, int(i), pool, alpha, r_max)
        for j in adj[i]:
            if i in adj[j]:
                continue
            merged = np.append(adj[j], i)
            if len(merged) > r_max:
                adj[j] = _robust_prune(x, int(j), merged, alpha, r_max)
            else:
                adj[j] = merged
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
