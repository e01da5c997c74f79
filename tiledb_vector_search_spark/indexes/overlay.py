"""Index-agnostic partial-probe overlay selection.

Partition-routed ANN indexes (IVF cells, Vamana shards) lose recall
exactly where a query's true neighbors sit across a partition boundary
— the cheaper the probe budget, the bigger the loss.  This module picks
one BOUNDED set of bridge rows (the overlay) that every query
additionally probes with an exact scan; the machinery is shared by
``VamanaIndex`` (r7: lifted nprobe=1/2 overlay recall 0.574/0.703 →
0.729/0.815 at build cost ×1.004) and ``IVFFlatIndex``.

Selection is a HYBRID of two signals, each taking half the budget
(measured ablation in ``indexes/vamana.py`` history: per-shard rank
0.841 → per-pair 0.847 → hybrid 0.856 at the sf0.1 gate corpus):

1. SELF-AUDIT: a bounded hash-sampled set of corpus rows replays the
   partial-probe query path against the fresh assignment — each
   pseudo-query ranks its nearest cells, and any true top-10 neighbor
   whose home cell ranks beyond the probe budget is a row a real query
   WOULD have missed.  Misses are weighted across probe LEVELS
   (1, 2, audit_nprobe) so rows missed even by generous probes outrank
   ones a second probe would already rescue.
2. BOUNDARY MARGIN: per-row margin ``d²(second) − d²(nearest
   centroid)``, budgeted PER BOUNDARY PAIR via a deterministic
   waterfill — a partition's global smallest margins can all crowd
   onto its single tightest boundary, leaving the others uncovered.

Scale posture: the audit cost is a function of the BUDGET (pseudo-query
sample ≈ max(8·budget, 2048) rows), not the corpus; the margin pass is
one narrow (id, partition, second, margin) projection (~24 B/row — the
vector payload never shuffles; picked vectors come back by broadcast
semi-join of ≤ budget ids); driver state is ≤ partitions² pair counts.

Reference analogue: DiskANN's sharded build overlaps shards for the
same reason (``src/include/index/vamana_index.h:322-460``); the
reference IVF guidance is nprobe = √partitions for "accuracy close to
100%" (``ivf_flat_index.py:215``) — the overlay is what makes the
CHEAPER settings usable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.schemas import (
    ID_COL,
    PARTITION_COL,
    VECTOR_COL,
)


def audit_sample_size(budget: int) -> int:
    """Pseudo-query sample bound for the overlay self-audit: enough
    corpus rows to rank misses stably at ``budget`` overlay slots, never
    fewer than 2048 (small-corpus noise floor), never proportional to
    corpus size — the audit cost is a function of the BUDGET, not the
    data."""
    return max(8 * budget, 2048)


def waterfill_quotas(
    pair_counts: "dict[tuple[int, int], int]", budget: int
) -> "dict[tuple[int, int], int]":
    """Deterministic waterfill of ``budget`` overlay slots over observed
    boundary pairs: every pair gets an equal share of what remains, a
    pair with fewer rows than its share takes what it has and donates
    the rest downstream.  Processing order (count asc, pair id) makes
    the split a pure function of the counts.  Σ quotas ≤ budget; equals
    it whenever Σ counts ≥ budget."""
    out: dict[tuple[int, int], int] = {}
    pairs = sorted(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
    left = budget
    for i, (pair, cnt) in enumerate(pairs):
        share = left // (len(pairs) - i)
        take = min(cnt, share)
        out[pair] = take
        left -= take
    return out


def audit_missed_ids(
    assigned: DataFrame,
    margined: DataFrame,
    centroids: np.ndarray,
    vector_dtype: str,
    audit_nprobe: int,
    budget: int,
    n_total: int,
    levels: "list[int] | None" = None,
) -> DataFrame:
    """Rows a partial-probe query would MISS, by replaying the query
    path with the corpus as pseudo-queries — returns the ``budget``
    most-missed rows as (id, partition, second).

    ``levels`` (default ``[audit_nprobe]``): probe budgets to score
    against SIMULTANEOUSLY from the one audit job — a neighbor found
    in the query's cell-rank ``c`` counts one miss for every level
    ``l < c``, so a row deep in the routing order (missed even by
    generous probes) outranks one a second probe would already
    rescue.  This is what lifts the CHEAPEST probe settings (the
    100 TB operating regime) without a second audit pass.

    Scale posture: the pseudo-query sample is bounded (hash filter,
    ≈ max(8·budget, 2048) rows); each routes to ``audit_nprobe
    + 4`` cells; the per-cell search is a cogroup keyed on cell id —
    one bounded IVF-query-batch-shaped job, narrow outputs
    throughout; the final take is a TakeOrdered of ``budget`` rows.
    """
    from tiledb_vector_search_spark.operators.topk import topk_window

    spark = assigned.sparkSession
    k_cells = centroids.shape[0]
    R = min(k_cells, audit_nprobe + 4)
    n_pq = audit_sample_size(budget)
    frac = min(1.0, n_pq / max(n_total, 1))
    pq = assigned.select(ID_COL, VECTOR_COL).where(
        (F.abs(F.xxhash64(F.col(ID_COL))) % 1000000)
        < int(frac * 1000000)
    )
    bc = spark.sparkContext.broadcast(centroids)
    vdtype = vector_dtype

    def route(batches):
        from tiledb_vector_search_spark.functions.dtypes import (
            decode_matrix,
        )

        cents = bc.value
        c_sq = np.sum(cents * cents, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = decode_matrix(pdf[VECTOR_COL], vdtype)
            d = c_sq[None, :] - 2.0 * (x @ cents.T)
            order = np.argsort(d, axis=1, kind="stable")[:, :R]
            rows = {
                "__cell": order.reshape(-1).astype(np.int32),
                "__crank": np.tile(
                    np.arange(1, R + 1, dtype=np.int32), len(pdf)
                ),
                ID_COL: np.repeat(
                    pdf[ID_COL].to_numpy(), R
                ),
                # object-array repeat copies REFERENCES to the vector
                # lists (cheap), not the 64-float payloads
                VECTOR_COL: np.repeat(pdf[VECTOR_COL].to_numpy(), R),
            }
            yield pd.DataFrame(rows)

    vec_type = (
        "binary" if vdtype != "float32" else "array<float>"
    )
    routed = pq.mapInPandas(
        route,
        schema=(
            f"__cell int, __crank int, {ID_COL} long, "
            f"{VECTOR_COL} {vec_type}"
        ),
    )

    k_audit = 10

    def cell_search(cell_pdf: pd.DataFrame, q_pdf: pd.DataFrame):
        from tiledb_vector_search_spark.functions.dtypes import (
            decode_matrix,
        )

        empty = pd.DataFrame(
            {"__qid": [], "__rid": [], "__d": [], "__crank": []}
        )
        if len(cell_pdf) == 0 or len(q_pdf) == 0:
            return empty
        ids = cell_pdf[ID_COL].to_numpy(dtype=np.int64)
        x = decode_matrix(cell_pdf[VECTOR_COL], vdtype)
        qm = decode_matrix(q_pdf[VECTOR_COL], vdtype)
        d = (
            np.sum(x * x, axis=1)[None, :]
            - 2.0 * (qm @ x.T)
            + np.sum(qm * qm, axis=1)[:, None]
        )
        np.maximum(d, 0.0, out=d)
        take = min(k_audit + 1, len(ids))  # +1 absorbs the self-hit
        qids = q_pdf[ID_COL].to_numpy(dtype=np.int64)
        cranks = q_pdf["__crank"].to_numpy(dtype=np.int64)
        # fully vectorized per-cell top-take (the original per-candidate
        # Python loop dominated the whole overlay build — ~3.7 s of a
        # 4.7 s sf0.1 delta); identical candidate SET and distances, the
        # downstream top-10 window imposes the order
        top = np.argpartition(d, take - 1, axis=1)[:, :take]
        rid = ids[top].reshape(-1)
        dist = np.take_along_axis(d, top, axis=1).reshape(-1)
        qrep = np.repeat(qids, take)
        crep = np.repeat(cranks, take)
        keep = rid != qrep  # a pseudo-query always finds itself
        return pd.DataFrame(
            {
                "__qid": qrep[keep],
                "__rid": rid[keep],
                "__d": dist[keep],
                "__crank": crep[keep],
            }
        )

    cand = (
        assigned.select(PARTITION_COL, ID_COL, VECTOR_COL)
        .withColumnRenamed(PARTITION_COL, "__cell")
        .groupBy("__cell")
        .cogroup(routed.groupBy("__cell"))
        .applyInPandas(
            cell_search,
            "__qid long, __rid long, __d double, __crank int",
        )
    )
    top10 = topk_window(
        cand,
        ["__qid"],
        [F.col("__d").asc(), F.col("__rid").asc()],
        k_audit,
    )
    lvls = sorted(set(levels)) if levels else [audit_nprobe]
    weight = sum(
        (F.col("__crank") > l).cast("int") for l in lvls
    )
    miss_counts = (
        top10.where(F.col("__crank") > min(lvls))
        .groupBy("__rid")
        .agg(F.sum(weight).alias("__miss"))
    )
    return (
        margined.join(
            miss_counts.withColumnRenamed("__rid", ID_COL), ID_COL
        )
        .orderBy(
            F.col("__miss").desc(),
            F.col("__margin").asc(),
            F.col(ID_COL).asc(),
        )
        .limit(budget)
        .select(ID_COL, PARTITION_COL, "__second")
    )


def select_overlay_ids(
    assigned: DataFrame,
    centroids: np.ndarray,
    vector_dtype: str,
    overlay_max: int,
    boost_max: int = 0,
    audit_nprobe: "int | None" = None,
    n_total: "int | None" = None,
) -> "list[int]":
    """Pick the overlay member ids (≤ ``overlay_max + boost_max``) for a
    partition-routed index — module docstring has the selection design.
    Returns a sorted id list (bounded, so driver-side by construction);
    the caller semi-joins vectors back and writes its own layout.

    ``boost_max`` adds a second, capped, PURE-AUDIT tranche on top of
    ``overlay_max`` — extra slots dedicated to the cheapest probe
    settings (the level-weighted audit ranks rows missed even at
    nprobe=1/2 highest).

    When ``assigned`` already carries ``__second``/``__margin`` columns
    (the ingest kernels emit them via ``with_margins=True`` — same
    top-2 derivation from the same distance matrix), the standalone
    margin scan is SKIPPED: the boundary signal is a narrow projection
    of work the ingest already paid for, dropping one full-corpus
    assignment pass from every overlay build."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from tiledb_vector_search_spark.session import small_df

    if overlay_max < 1:
        raise ValueError(
            "overlay_max must be >= 1 (or build without overlay)"
        )
    spark = assigned.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    vdtype = vector_dtype

    def margins(batches):
        from tiledb_vector_search_spark.functions.dtypes import (
            decode_matrix,
        )

        cents = bc.value
        c_sq = np.sum(cents * cents, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = decode_matrix(pdf[VECTOR_COL], vdtype)
            # ‖x−c‖² minus the per-row ‖x‖² constant: margins unchanged
            d = c_sq[None, :] - 2.0 * (x @ cents.T)
            from tiledb_vector_search_spark.ml.kmeans import (
                second_and_margin,
            )

            second, margin = second_and_margin(d)
            yield pd.DataFrame(
                {
                    ID_COL: pdf[ID_COL],
                    PARTITION_COL: pdf[PARTITION_COL],
                    "__second": second,
                    "__margin": margin,
                }
            )

    if "__second" in assigned.columns and "__margin" in assigned.columns:
        # ingest already computed the boundary signal in its own assign
        # kernel (with_margins=True): the margin frame is a narrow
        # projection — no second full-corpus assignment scan
        margined = assigned.select(
            ID_COL, PARTITION_COL, "__second", "__margin"
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        margined = (
            assigned.select(ID_COL, VECTOR_COL, PARTITION_COL)
            .mapInPandas(
                margins,
                schema=(
                    f"{ID_COL} long, {PARTITION_COL} int, "
                    "__second int, __margin double"
                ),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    try:
        k_cells = centroids.shape[0]
        if audit_nprobe is None:
            # the query path's default probe budget
            audit_nprobe = max(1, int(np.sqrt(k_cells)) + 1)

        def _pair_counts() -> dict:
            # bounded driver work: ≤ partitions² (pair, count) rows
            return {
                (int(r[PARTITION_COL]), int(r["__second"])): int(r["cnt"])
                for r in margined.groupBy(PARTITION_COL, "__second")
                .agg(F.count("*").alias("cnt"))
                .collect()
            }

        def _audit(nt: int) -> list:
            miss_ids_df = audit_missed_ids(
                assigned, margined, centroids, vdtype, audit_nprobe,
                # the boost tranche is pure-audit by design: it exists
                # for the cheapest probe settings, which only the
                # level-weighted audit can see
                overlay_max // 2 + boost_max, nt,
                # score the cheap probe settings too: the overlay must
                # carry nprobe=1/2 (where a 100 TB operator actually
                # runs), not only the declared audit point
                levels=sorted({1, 2, audit_nprobe}),
            )
            # bounded: ≤ overlay_max // 2 + boost_max rows
            return miss_ids_df.collect()

        total_budget = overlay_max + boost_max
        miss_rows: list = []
        if k_cells > audit_nprobe and n_total is not None:
            # guide §2.6: the pair-count aggregate and the audit chain
            # are independent jobs over the persisted margin frame —
            # submit both from driver threads so the audit's stages
            # back-fill the aggregate's tail instead of queueing after
            # it.  Possible only when the caller supplies the corpus
            # row count (ingest already counted it); the value is
            # identical to the sum of the pair counts, so the audit's
            # sample fraction — and therefore overlay membership — is
            # byte-identical to the sequential path.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                f_pairs = pool.submit(_pair_counts)
                f_miss = pool.submit(_audit, int(n_total))
                pair_counts = f_pairs.result()
                miss_rows = f_miss.result()
        else:
            pair_counts = _pair_counts()
            if n_total is None:
                n_total = sum(pair_counts.values())
            if k_cells > audit_nprobe:
                miss_rows = _audit(int(n_total))
        miss_id_set = {int(r[ID_COL]) for r in miss_rows}
        for r in miss_rows:
            pair = (int(r[PARTITION_COL]), int(r["__second"]))
            pair_counts[pair] -= 1

        quotas = waterfill_quotas(
            {p: c for p, c in pair_counts.items() if c > 0},
            total_budget - len(miss_id_set),
        )
        qdf = small_df(
            spark,
            [(p, s, q) for (p, s), q in quotas.items()],
            f"{PARTITION_COL} int, __second int, __quota int",
        )
        miss_df = small_df(
            spark,
            [(int(i),) for i in sorted(miss_id_set)] or [(-1,)],
            f"{ID_COL} long",
        )
        w = Window.partitionBy(PARTITION_COL, "__second").orderBy(
            F.col("__margin").asc(), F.col(ID_COL).asc()
        )
        picked = {
            int(r[ID_COL])
            for r in margined.join(
                F.broadcast(miss_df), ID_COL, "left_anti"
            )
            .withColumn("__r", F.row_number().over(w))
            .join(F.broadcast(qdf), [PARTITION_COL, "__second"], "inner")
            .where(F.col("__r") <= F.col("__quota"))
            .select(ID_COL)
            .collect()
        }
        picked |= miss_id_set
    finally:
        margined.unpersist()
    return sorted(picked)
