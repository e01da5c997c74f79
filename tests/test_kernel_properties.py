"""Property tests for the numpy kernels (hypothesis, no Spark session).

SURVEY §5: "property tests for distance UDFs against numpy".  These pin the
kernel strategies' math against naive definitions and the deterministic
tie-break contract."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from tiledb_vector_search_spark.functions.distance import DistanceMetric
from tiledb_vector_search_spark.ml.kmeans import kmeans_numpy
from tiledb_vector_search_spark.operators.knn import (
    _kernel_distances,
    partial_topk_idx,
)

finite = st.floats(-100, 100, allow_nan=False, width=32)


def _mats(draw, max_n=8, max_d=6):
    nq = draw(st.integers(1, max_n))
    nb = draw(st.integers(1, max_n))
    d = draw(st.integers(1, max_d))
    q = draw(arrays(np.float64, (nq, d), elements=finite))
    x = draw(arrays(np.float64, (nb, d), elements=finite))
    return q, x


@st.composite
def qx(draw):
    return _mats(draw)


@settings(max_examples=60, deadline=None)
@given(qx())
def test_sum_of_squares_matches_naive(pair):
    q, x = pair
    got = _kernel_distances(q, x, DistanceMetric.SUM_OF_SQUARES)
    want = np.array([[np.sum((a - b) ** 2) for b in x] for a in q])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(qx())
def test_l2_is_sqrt_sos(pair):
    q, x = pair
    got = _kernel_distances(q, x, DistanceMetric.L2)
    sos = _kernel_distances(q, x, DistanceMetric.SUM_OF_SQUARES)
    np.testing.assert_allclose(got, np.sqrt(sos), rtol=1e-8, atol=1e-6)
    assert (got >= 0).all()


@settings(max_examples=60, deadline=None)
@given(qx())
def test_inner_product_matches_naive(pair):
    q, x = pair
    got = _kernel_distances(q, x, DistanceMetric.INNER_PRODUCT)
    np.testing.assert_allclose(got, q @ x.T, rtol=1e-8, atol=1e-6)


@settings(max_examples=60, deadline=None)
@given(qx())
def test_cosine_bounded_and_zero_safe(pair):
    q, x = pair
    got = _kernel_distances(q, x, DistanceMetric.COSINE)
    assert np.isfinite(got).all()  # zero vectors must not produce NaN
    assert (got >= -1e-9).all() and (got <= 2 + 1e-9).all()


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_partial_topk_deterministic_ties(data):
    """partial_topk_idx must pick exactly the (value, id)-lexicographic
    smallest k, regardless of argpartition's arbitrary tie choices."""
    nq = data.draw(st.integers(1, 4))
    nb = data.draw(st.integers(1, 12))
    k = data.draw(st.integers(1, nb))
    # few distinct values → dense ties
    vals = data.draw(
        arrays(np.float64, (nq, nb), elements=st.sampled_from([0.0, 1.0, 2.0]))
    )
    ids = np.array(data.draw(st.permutations(range(nb))), dtype=np.int64)
    idx = partial_topk_idx(vals.copy(), ids, k)
    for qi in range(nq):
        got = sorted(zip(vals[qi][idx[qi]], ids[idx[qi]]))
        want = sorted(zip(vals[qi], ids))[:k]
        assert got == want


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_kmeans_numpy_invariants(data):
    n = data.draw(st.integers(4, 40))
    d = data.draw(st.integers(1, 5))
    k = data.draw(st.integers(1, 8))
    x = data.draw(
        arrays(np.float64, (n, d), elements=st.floats(-10, 10, allow_nan=False))
    )
    for init in ("random", "k-means++"):
        c = kmeans_numpy(x, k, seed=1, init=init)
        assert c.shape == (min(k, n), d)
        assert np.isfinite(c).all()
        # centroids live in the data's bounding box
        assert (c >= x.min(axis=0) - 1e-9).all()
        assert (c <= x.max(axis=0) + 1e-9).all()
