"""Distance expression correctness vs numpy, and DuckDB-oracle parity.

The parity test is load-bearing: the driver's correctness gate hashes values
from our Spark plans against DuckDB SQL, so the double-precision fold here
must agree with ``duckdb_distance_sql``.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.distance import (
    DistanceMetric,
    distance_expr,
    duckdb_distance_sql,
    normalize_expr,
)

METRICS = list(DistanceMetric)


@pytest.fixture(scope="module")
def pair_df(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a")
    ).where("a_id < 20")
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b")
    ).where("b_id >= 20 and b_id < 40")
    return a.crossJoin(b)


@pytest.mark.parametrize("metric", METRICS)
def test_distance_matches_numpy(spark, sf_dir, embeddings_np, pair_df, metric):
    ids, mat = embeddings_np
    rows = (
        pair_df.select(
            "a_id", "b_id", distance_expr("a", "b", metric).alias("d")
        )
        .orderBy("a_id", "b_id")
        .collect()
    )
    lut = {int(i): mat[j] for j, i in enumerate(ids)}
    for r in rows:
        va, vb = lut[r.a_id], lut[r.b_id]
        if metric is DistanceMetric.SUM_OF_SQUARES:
            expect = float(np.sum((va - vb) ** 2))
        elif metric is DistanceMetric.L2:
            expect = float(np.sqrt(np.sum((va - vb) ** 2)))
        elif metric is DistanceMetric.COSINE:
            expect = float(
                1.0
                - (va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
            )
        else:
            expect = float(va @ vb)
        assert r.d == pytest.approx(expect, rel=1e-12), (r.a_id, r.b_id)


@pytest.mark.parametrize("metric", METRICS)
def test_distance_bitwise_parity_with_duckdb(spark, sf_dir, metric):
    """Spark higher-order-function fold == DuckDB list fold, bit for bit."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a")).where(
        "a_id < 10"
    )
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b")).where(
        "b_id >= 10 and b_id < 20"
    )
    spark_rows = (
        a.crossJoin(b)
        .select("a_id", "b_id", distance_expr("a", "b", metric).alias("d"))
        .orderBy("a_id", "b_id")
        .collect()
    )
    dsql = duckdb_distance_sql("x.embedding", "y.embedding", metric)
    duck_rows = duckdb.sql(
        f"""
        SELECT x.vec_id a_id, y.vec_id b_id, {dsql} d
        FROM '{sf_dir}/embeddings.parquet' x, '{sf_dir}/embeddings.parquet' y
        WHERE x.vec_id < 10 AND y.vec_id >= 10 AND y.vec_id < 20
        ORDER BY a_id, b_id
        """
    ).fetchall()
    assert len(spark_rows) == len(duck_rows) == 100
    for s, d in zip(spark_rows, duck_rows):
        assert (s.a_id, s.b_id) == (d[0], d[1])
        assert s.d == d[2], f"bitwise mismatch at {s.a_id},{s.b_id}: {s.d!r} vs {d[2]!r}"


def test_normalize(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    rows = emb.select(normalize_expr("embedding").alias("n")).collect()
    for r in rows:
        assert np.linalg.norm(np.array(r.n)) == pytest.approx(1.0, abs=1e-9)
    # zero-safe
    z = spark.createDataFrame([([0.0, 0.0],)], "v array<float>")
    assert z.select(normalize_expr("v").alias("n")).collect()[0].n == [0.0, 0.0]
