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


def test_reference_root_export_parity():
    """Every name the reference exports from its package root resolves here
    (reference ``__init__.py:31-54`` __all__), so reference scripts
    import-and-run unchanged."""
    import tiledb_vector_search_spark as m

    ref_all = [
        "Index", "FlatIndex", "IVFFlatIndex", "VamanaIndex", "IVFPQIndex",
        "Mode", "open", "load_as_array", "load_as_matrix", "ingest",
        "query_vq_nth", "query_vq_heap", "ivf_query", "ivf_query_ram",
        "validate_top_k", "ivf_index", "ivf_index_tdb", "array_to_matrix",
        "partition_ivf_index", "utils", "STORAGE_VERSION", "storage_formats",
    ]
    missing = [n for n in ref_all if not hasattr(m, n)]
    assert not missing, f"reference exports unresolved: {missing}"
    # the storage_formats table covers the current version with the
    # reference's key set where the concept carries over
    fmt = m.storage_formats[m.STORAGE_VERSION]
    assert fmt["SUPPORT_TIMETRAVEL"] is True
    assert m.Mode.LOCAL.name == "LOCAL"


def test_matrix_shims(spark, arrays):
    src, _, mat = arrays
    import tiledb_vector_search_spark as m

    fm = m.array_to_matrix(mat.astype(np.float32))
    assert fm.flags["F_CONTIGUOUS"] and (fm == mat).all()
    with pytest.raises(TypeError):
        m.array_to_matrix(mat.astype(np.float16))
    # load_as_matrix = the (dims x n) col-major form of load_as_array
    lm = m.load_as_matrix(src, size=50)
    assert lm.shape == (mat.shape[1], 50) and lm.flags["F_CONTIGUOUS"]
    assert (lm.T == mat[:50]).all()


def test_ivf_index_tdb_from_stored_fvecs(spark, tmp_path):
    """URI-in/URI-out build path: write an fvecs corpus, build an IVF index
    straight from the file, query it."""
    import tiledb_vector_search_spark as m

    rng = np.random.default_rng(11)
    base = rng.random((120, 8), dtype=np.float32)
    src = str(tmp_path / "base.fvecs")
    m.utils.write_fvecs(src, base)
    idx = m.ivf_index_tdb(
        spark, str(tmp_path / "idx"), src, partitions=4, timestamp=100
    )
    q = spark.createDataFrame(
        [(0, [float(x) for x in base[7]])], "query_id long, vector array<float>"
    )
    res = idx.query(q, k=1, nprobe=4).collect()
    assert res[0].external_id == 7


def test_ingest_reference_kwargs_migration(spark, tmp_path):
    """Reference ingest() call shapes migrate: index_uri/index_timestamp
    alias uri/timestamp, scheduler knobs are accepted no-ops, and
    semantic reference kwargs raise with the Spark-native redirect
    instead of a bare TypeError."""
    import pytest as _pytest

    from tiledb_vector_search_spark import ingest
    from tiledb_vector_search_spark.compat import Mode

    src = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(6)],
        "external_id long, vector array<float>",
    )
    idx = ingest(
        spark,
        source=src,
        index_type="FLAT",
        index_uri=str(tmp_path / "mig"),
        index_timestamp=1000,
        mode=Mode.LOCAL,
        config={"sm.x": "y"},
        workers=8,
        verbose=True,
        ingest_resources={"cpu": "4"},
    )
    assert idx.base_ts == 1000
    q = spark.createDataFrame(
        [(0, [0.0, 0.0])], "query_id long, vector array<float>"
    )
    assert idx.query(q, k=1).count() == 1
    # conflicting timestamp aliases raise (mirrors the uri/index_uri
    # pair) — a silent overwrite would stamp the ingestion elsewhere
    with _pytest.raises(ValueError, match="timestamp or index_timestamp"):
        ingest(
            spark,
            source=src,
            index_type="FLAT",
            index_uri=str(tmp_path / "x"),
            timestamp=1000,
            index_timestamp=2000,
        )
    # equal values are NOT a conflict
    idx_eq = ingest(
        spark,
        source=src,
        index_type="FLAT",
        index_uri=str(tmp_path / "eq"),
        timestamp=1500,
        index_timestamp=1500,
    )
    assert idx_eq.base_ts == 1500
    with _pytest.raises(TypeError, match="source_uri"):
        ingest(spark, str(tmp_path / "x"), src, source_uri="/data/v.fvecs")
    with _pytest.raises(TypeError, match="limit"):
        ingest(spark, str(tmp_path / "x"), src, size=100)
    with _pytest.raises(ValueError, match="not both"):
        ingest(spark, str(tmp_path / "a"), src, index_uri=str(tmp_path / "b"))
