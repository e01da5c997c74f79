"""Reference-named module-level API (compat surface).

Parity targets: reference ``module.py`` exports — a reference user's
imports keep working with the same result contracts.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import tiledb_vector_search_spark as tvs


@pytest.fixture(scope="module")
def arrays(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = emb.select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )
    ids, mat = tvs.load_as_array(src)
    return src, ids, mat


def test_load_as_array(spark, sf_dir, arrays):
    src, ids, mat = arrays
    assert ids.shape[0] == mat.shape[0] == src.count()
    assert list(ids[:3]) == sorted(ids[:3])  # sorted by id
    # path form + size cap
    ids2, mat2 = tvs.load_as_array(
        f"{sf_dir}/embeddings.parquet", spark=spark, size=10
    )
    assert ids2.shape[0] == 10


def test_query_vq_matches_bruteforce(arrays):
    src, ids, mat = arrays
    q = mat[:5]
    dist, rids = tvs.query_vq_nth(mat, ids, q, 10)
    assert dist.shape == rids.shape == (5, 10)
    # self-match first at distance 0
    assert (rids[:, 0] == ids[:5]).all()
    # the q·q − 2q·b + b·b formulation carries ~1e-8 noise at zero
    assert np.allclose(dist[:, 0], 0.0, atol=1e-6)
    # exact vs numpy argsort ground truth
    full = np.sqrt(((q[:, None, :] - mat[None, :, :]) ** 2).sum(-1))
    gt = ids[np.argsort(full, axis=1, kind="stable")[:, :10]]
    assert tvs.validate_top_k(rids, gt)
    # heap variant: identical contract
    dist2, rids2 = tvs.query_vq_heap(mat, ids, q, 10)
    assert (rids2 == rids).all()


def test_partition_ivf_index_routes(arrays):
    _, ids, mat = arrays
    centroids = mat[:4]
    pairs = tvs.partition_ivf_index(centroids, mat[:3], nprobe=2)
    assert len(pairs) == 6  # 3 queries x 2 probes
    # query i sits exactly on centroid i -> it must probe partition i first
    assert (0, 0) in pairs and (1, 1) in pairs and (2, 2) in pairs


def test_ivf_index_and_query_wrappers(spark, arrays, tmp_path):
    src, ids, mat = arrays
    idx = tvs.ivf_index(
        spark, str(tmp_path / "idx"), src, partitions=8, timestamp=1000
    )
    q = src.where("external_id < 3").select(
        F.col("external_id").alias("query_id"), "vector"
    )
    r1 = tvs.ivf_query(idx, q, 5, nprobe=8).collect()
    r2 = tvs.ivf_query_ram(idx, q, 5, nprobe=8).collect()
    assert len(r1) == len(r2) == 15
    assert {(r.query_id, r.external_id) for r in r1} == {
        (r.query_id, r.external_id) for r in r2
    }


def test_validate_top_k_shapes():
    a = np.array([[1, 2], [3, 4]])
    assert tvs.validate_top_k(a, np.array([[2, 1], [4, 3]]))  # set equality
    assert not tvs.validate_top_k(a, np.array([[1, 2], [3, 5]]))
    assert not tvs.validate_top_k(a, np.array([[1, 2]]))
    assert tvs.STORAGE_VERSION


def test_utils_vecs_roundtrip(tmp_path):
    """utils.load_* round-trips the reference's vecs layouts, including the
    reference's own backwards-compat fvecs corpus when present."""
    from tiledb_vector_search_spark import utils
    import os

    rng = np.random.default_rng(3)
    f = rng.random((20, 8), dtype=np.float32)
    utils.write_fvecs(str(tmp_path / "a.fvecs"), f)
    assert (utils.load_fvecs(str(tmp_path / "a.fvecs")) == f).all()
    iv = rng.integers(0, 1000, (7, 5)).astype(np.int32)
    utils.write_ivecs(str(tmp_path / "a.ivecs"), iv)
    assert (utils.load_ivecs(str(tmp_path / "a.ivecs")) == iv).all()
    b = rng.integers(0, 255, (9, 16)).astype(np.uint8)
    utils.write_bvecs(str(tmp_path / "a.bvecs"), b)
    assert (utils.load_bvecs(str(tmp_path / "a.bvecs")) == b).all()

    ref = "/root/reference/backwards-compatibility-data/siftmicro_base.fvecs"
    if os.path.exists(ref):
        m = utils.load_fvecs(ref)
        assert m.shape == (100, 128)
