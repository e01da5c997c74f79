"""Brute-force k-NN (FLAT query path) vs numpy oracle, both strategies."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.distance import DistanceMetric
from tiledb_vector_search_spark.operators.knn import knn_bruteforce

from tests.conftest import numpy_topk

K = 10
NQ = 7


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )


@pytest.fixture(scope="module")
def queries(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(f"vec_id < {NQ}")
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector"))
    )


@pytest.mark.parametrize("strategy", ["expr", "kernel"])
@pytest.mark.parametrize(
    "metric", [DistanceMetric.SUM_OF_SQUARES, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT]
)
def test_knn_matches_numpy(vectors, queries, embeddings_np, strategy, metric):
    ids, mat = embeddings_np
    qmat = mat[np.isin(ids, np.arange(NQ))]
    oracle = numpy_topk(qmat, ids, mat, K, metric.value)

    res = knn_bruteforce(vectors, queries, K, metric, strategy=strategy)
    got = res.orderBy("query_id", "rank").collect()
    assert len(got) == NQ * K
    for r in got:
        oid, odist = oracle[r.query_id][r.rank - 1]
        assert r.external_id == oid, (
            f"q={r.query_id} rank={r.rank}: {r.external_id} != {oid}"
        )
        assert r.distance == pytest.approx(odist, rel=1e-9, abs=1e-9)


def test_knn_strategies_agree_on_ids(vectors, queries):
    a = knn_bruteforce(vectors, queries, K, "l2", strategy="expr")
    b = knn_bruteforce(vectors, queries, K, "l2", strategy="kernel")
    ra = {(r.query_id, r.rank): r.external_id for r in a.collect()}
    rb = {(r.query_id, r.rank): r.external_id for r in b.collect()}
    assert ra == rb


def test_knn_expr_plan_has_broadcast(vectors, queries):
    plan = knn_bruteforce(
        vectors, queries, K, "sum_of_squares", strategy="expr"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, plan


def test_kernel_refuses_bulk_query_batch(spark, vectors):
    """The kernel strategy collects queries to the driver — a batch past
    KERNEL_MAX_NQ must raise with a pointer at the distributed paths."""
    from tiledb_vector_search_spark.operators.knn import (
        KERNEL_MAX_NQ,
        knn_bruteforce_kernel,
    )

    bulk = spark.range(KERNEL_MAX_NQ + 1).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(0.0), F.lit(1.0)).alias("vector"),
    )
    with pytest.raises(ValueError, match="knn_join"):
        knn_bruteforce_kernel(vectors, bulk, K)


def test_knn_join_trained_centroids_recall(spark, sf_dir, embeddings_np):
    """knn_join with self-trained centroids: result shape + high recall@k
    vs exact brute force at a generous nprobe (full probe = exact)."""
    from tiledb_vector_search_spark.operators.knn import knn_join

    ids, mat = embeddings_np
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    left = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    right = emb.select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )
    for strategy in ("kernel", "expr"):
        res = knn_join(
            left, right, K, partitions=8, nprobe=8, seed=7, strategy=strategy
        )
        got = res.orderBy("query_id", "rank").collect()
        assert len(got) == 20 * K, strategy
        # full probe (nprobe == partitions) must be EXACT
        qmat = mat[np.isin(ids, np.arange(20))]
        exact = numpy_topk(qmat, ids, mat, K, "sum_of_squares")
        for r in got:
            ee, ed = exact[r.query_id][r.rank - 1]
            assert r.external_id == ee, strategy
            assert abs(r.distance - ed) < 1e-9, strategy


def test_knn_join_hot_cell_auto_split(spark):
    """An adversarially clustered corpus (every vector lands in ONE IVF
    cell) must salt-split that cell and still return exactly the
    unsalted/expr results — the per-slice partial top-ks merge losslessly
    in the final window."""
    import random

    from tiledb_vector_search_spark.operators.knn import (
        _cell_splits,
        knn_join,
    )
    from tiledb_vector_search_spark.ml.kmeans import assign_partitions_expr

    rng = random.Random(3)
    # 400 vectors in a tight cluster around (10, 10) + 4 decoys elsewhere;
    # centroids place cell 0 on the cluster -> hot cell with ~400 rows
    rows = [
        (i, [10.0 + rng.uniform(-0.5, 0.5), 10.0 + rng.uniform(-0.5, 0.5)])
        for i in range(400)
    ] + [(1000 + j, [float(-10 - j), float(-10 - j)]) for j in range(4)]
    right = spark.createDataFrame(rows, "external_id long, vector array<float>")
    left = spark.createDataFrame(
        rows[:25], "query_id long, vector array<float>"
    )
    cents = np.array([[10.0, 10.0], [-11.0, -11.0]])

    assigned = assign_partitions_expr(
        right.selectExpr("external_id as __rid", "vector as __rvec"),
        cents,
        vector_col="__rvec",
    )
    splits = _cell_splits(assigned, 64)
    assert splits.get(0, 0) >= 4, splits  # the hot cell really splits

    def key(df):
        return sorted(
            (r.query_id, r.rank, r.external_id, round(r.distance, 9))
            for r in df.collect()
        )

    want = key(knn_join(left, right, 5, centroids=cents, nprobe=1,
                        strategy="expr"))
    salted = key(knn_join(left, right, 5, centroids=cents, nprobe=1,
                          strategy="kernel", max_cell_rows=64))
    unsalted = key(knn_join(left, right, 5, centroids=cents, nprobe=1,
                            strategy="kernel", max_cell_rows=None))
    assert salted == want
    assert unsalted == want


def test_knn_join_no_broadcast_of_either_side(spark, sf_dir):
    """With broadcast joins disabled, the candidate join degrades to a
    shuffle join (SortMergeJoin/ShuffledHashJoin) — proving neither the
    left nor the right table must fit in memory; only the constant-size
    centroid frame is ever broadcast."""
    from tiledb_vector_search_spark.operators.knn import knn_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    left = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("vector")
    )
    right = emb.select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        res = knn_join(
            left, right, K, partitions=4, nprobe=2, seed=7, strategy="expr"
        )
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert res.count() > 0
        # kernel strategy: the candidate stage is a COGROUP (one Arrow
        # task per partition), no join of the two big sides at all
        resk = knn_join(
            left, right, K, partitions=4, nprobe=2, seed=7, strategy="kernel"
        )
        plank = resk._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapCoGroupsInPandas" in plank
        assert resk.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cosine_zero_vector_strategies_agree(spark):
    """A zero-norm corpus vector must rank LAST, not first: unguarded,
    the expr strategy's 0/0 division returned NULL and the ascending
    top-k window (NULLS FIRST) crowned the zero vector the #1 neighbor
    of every query; the kernel returns distance 1.0 for it."""
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])]
    vecs = spark.createDataFrame(rows, "external_id long, vector array<float>")
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, vector array<float>"
    )
    for strategy in ("expr", "kernel"):
        got = (
            knn_bruteforce(vecs, q, k=3, metric="cosine", strategy=strategy)
            .orderBy("rank")
            .collect()
        )
        assert [r.external_id for r in got] == [0, 1, 2], strategy
        assert all(r.distance is not None for r in got), strategy
        assert abs(got[2].distance - 1.0) < 1e-9, strategy


def test_kernel_empty_query_batch_returns_empty(spark):
    """An empty query batch returns an empty frame instead of crashing
    the matmul inside every executor task with a (0,) qmat."""
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "external_id long, vector array<float>"
    )
    q = spark.createDataFrame([], "query_id long, vector array<float>")
    out = knn_bruteforce(vecs, q, k=3, strategy="kernel")
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "external_id", "distance", "rank"}
