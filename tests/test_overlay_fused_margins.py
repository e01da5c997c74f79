"""Overlay selection with ingest-fused margins is BIT-IDENTICAL to the
standalone margin-scan path.

Round-9 efficiency change: the ingest assign kernels emit
``__second``/``__margin`` alongside the assignment (``with_margins``),
and ``select_overlay_ids`` consumes them instead of re-deriving the
boundary signal with a second full-corpus scan.  Membership must be
PINNED — same ids from both paths — or the recall gates stop meaning
anything across the change.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes.overlay import select_overlay_ids
from tiledb_vector_search_spark.ml.kmeans import (
    assign_partitions_expr,
    train_centroids_ml,
)
from tiledb_vector_search_spark.schemas import ID_COL, VECTOR_COL


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias(ID_COL),
        F.col("embedding").cast("array<float>").alias(VECTOR_COL),
    )


@pytest.fixture(scope="module")
def centroids(vectors):
    n = vectors.count()
    return train_centroids_ml(vectors, 8, min(n, 2000), n, seed=7)


def test_fused_margin_columns_match_standalone_kernel(spark, vectors, centroids):
    fused = assign_partitions_expr(
        vectors, centroids, with_margins=True
    ).orderBy(ID_COL)
    rows = fused.select(
        ID_COL, "partition_id", "__second", "__margin"
    ).collect()
    # recompute the boundary signal directly in numpy on the same data
    ids = np.array([r[ID_COL] for r in rows])
    mat = np.array(
        [r[VECTOR_COL] for r in vectors.orderBy(ID_COL).collect()],
        dtype=np.float64,
    )
    c_sq = np.sum(centroids * centroids, axis=1)
    d = c_sq[None, :] - 2.0 * (mat @ centroids.T)
    two = np.argpartition(d, 1, axis=1)[:, :2]
    dv = np.take_along_axis(d, two, axis=1)
    swap = dv[:, 0] > dv[:, 1]
    second = np.where(swap, two[:, 0], two[:, 1])
    margin = np.abs(dv[:, 1] - dv[:, 0])
    got_second = np.array([r["__second"] for r in rows])
    got_margin = np.array([r["__margin"] for r in rows])
    assert (got_second == second).all()
    assert np.allclose(got_margin, margin, rtol=0, atol=0)  # bit-exact
    assert (
        np.array([r["partition_id"] for r in rows])
        == np.argmin(d, axis=1)
    ).all()


def test_overlay_membership_pinned_across_margin_paths(
    spark, vectors, centroids
):
    """select_overlay_ids(plain) == select_overlay_ids(fused): the
    precomputed-margin shortcut changes the PLAN, never the pick."""
    plain = assign_partitions_expr(vectors, centroids)
    fused = assign_partitions_expr(vectors, centroids, with_margins=True)
    kw = dict(overlay_max=64, boost_max=32, audit_nprobe=2)
    ids_plain = select_overlay_ids(plain, centroids, "float32", **kw)
    ids_fused = select_overlay_ids(fused, centroids, "float32", **kw)
    assert ids_plain == ids_fused
    assert 0 < len(ids_fused) <= 96


def test_with_margins_requires_two_centroids(spark, vectors):
    one = np.zeros((1, 64))
    with pytest.raises(ValueError, match=">= 2 centroids"):
        assign_partitions_expr(vectors, one, with_margins=True)


# -- waterfill properties (hypothesis) -----------------------------------

try:
    from hypothesis import given, settings as hsettings
    from hypothesis import strategies as st

    from tiledb_vector_search_spark.indexes.overlay import waterfill_quotas

    pair_counts = st.dictionaries(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=60,
    )

    @given(pair_counts, st.integers(min_value=0, max_value=20_000))
    @hsettings(max_examples=200, deadline=None)
    def test_waterfill_properties(counts, budget):
        q = waterfill_quotas(counts, budget)
        assert set(q) == set(counts)
        total = sum(q.values())
        assert total <= budget
        for pair, take in q.items():
            assert 0 <= take <= counts[pair]
        # budget is exhausted whenever the pairs can absorb it
        if sum(counts.values()) >= budget:
            assert total == budget
        # pure function of the counts: dict insertion order is irrelevant
        q2 = waterfill_quotas(dict(reversed(list(counts.items()))), budget)
        assert q == q2

except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass
