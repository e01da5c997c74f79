"""Top-level package surface: the reference-UX entry points.

A reference user writes ``from tiledb.vector_search import ingest, open``;
the equivalent here is ``import tiledb_vector_search_spark as tvs`` →
``tvs.ingest(...)`` / ``tvs.open(...)`` (reference exports:
``apis/python/src/tiledb/vector_search/__init__.py``).
"""

import pytest

import tiledb_vector_search_spark as tvs
from tiledb_vector_search_spark.indexes import IVFFlatIndex


@pytest.fixture(scope="module")
def source(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return emb.selectExpr(
        "vec_id as external_id", "cast(embedding as array<float>) as vector"
    )


def test_root_exports():
    for name in (
        "Index",
        "FlatIndex",
        "IVFFlatIndex",
        "IVFPQIndex",
        "VamanaIndex",
        "open",
        "open_index",
        "ingest",
        "get_spark",
    ):
        assert hasattr(tvs, name), name


def test_ingest_dispatch_and_open(spark, source, tmp_path):
    uri = str(tmp_path / "idx")
    idx = tvs.ingest(
        spark, uri, source, index_type="IVF_FLAT", partitions=4, timestamp=1000
    )
    assert isinstance(idx, IVFFlatIndex)
    reopened = tvs.open(spark, uri)
    assert isinstance(reopened, IVFFlatIndex)
    q = source.limit(2).selectExpr("external_id as query_id", "vector")
    assert reopened.query(q, k=3, nprobe=4).count() == 6


def test_ingest_unknown_type(spark, source, tmp_path):
    with pytest.raises(ValueError, match="unknown index_type"):
        tvs.ingest(spark, str(tmp_path / "x"), source, index_type="HNSW")


def test_storage_version_guard(spark, tmp_path):
    """Older supported layouts open; unknown/newer versions fail with a
    clear upgrade message (reference test_backwards_compatibility shape)."""
    import json

    from pyspark.sql import functions as F

    from tiledb_vector_search_spark.indexes import FlatIndex, open_index

    uri = str(tmp_path / "idx")
    src = spark.range(20).select(
        F.col("id").alias("external_id"),
        F.array(*[F.rand(seed=7) for _ in range(4)]).cast("array<float>").alias("vector"),
    )
    FlatIndex.ingest(spark, uri, src, timestamp=1)
    from tiledb_vector_search_spark.storage import IndexStorage

    st = IndexStorage(spark, uri)
    meta = st.read_meta()

    meta["storage_version"] = "spark-0.1"
    st.write_meta(meta)  # through the FS API so the CRC sidecar stays valid
    assert open_index(spark, uri).size() == 20  # older layout still opens

    meta["storage_version"] = "spark-99"
    st.write_meta(meta)
    with pytest.raises(ValueError, match="storage_version"):
        open_index(spark, uri)


def test_describe_operational_snapshot(spark, sf_dir, tmp_path):
    """describe(): identity + size + updates debt + partition balance,
    honoring the open timestamp."""
    from pyspark.sql import functions as F

    from tiledb_vector_search_spark.indexes import FlatIndex, IVFFlatIndex

    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )
    uri = str(tmp_path / "desc")
    IVFFlatIndex.ingest(spark, uri, src, partitions=8, timestamp=1000)
    idx = IVFFlatIndex(spark, uri)
    idx.update(987654, [0.0] * 64, timestamp=2000)
    d = IVFFlatIndex(spark, uri).describe()
    assert d["index_type"] == "IVF_FLAT" and d["partitions"] == 8
    assert d["pending_update_batches"] == 1
    assert d["size"] == src.count() + 1
    assert d["partition_rows_min"] <= d["partition_rows_mean"] <= d["partition_rows_max"]
    assert d["partition_skew"] >= 1.0
    # time travel: before the update there is no log debt
    d0 = IVFFlatIndex(spark, uri, timestamp=1500).describe()
    assert d0["pending_update_batches"] == 0 and d0["size"] == src.count()
    # FLAT has no partition stats
    furi = str(tmp_path / "descf")
    FlatIndex.ingest(spark, furi, src, timestamp=1000)
    df = FlatIndex(spark, furi).describe()
    assert "partition_rows_max" not in df and df["size"] == src.count()
    # SAME-handle freshness: update_batch writes to disk without touching
    # the open-time meta snapshot; describe must still see the new debt
    assert idx.describe()["pending_update_batches"] == 1
    idx.update(987655, [0.0] * 64, timestamp=3000)
    assert idx.describe()["pending_update_batches"] == 2


def test_get_dimensions_reference_parity(spark, tmp_path):
    from tiledb_vector_search_spark.indexes import FlatIndex

    src = spark.createDataFrame(
        [(0, [0.0, 1.0, 2.0])], "external_id long, vector array<float>"
    )
    idx = FlatIndex.ingest(spark, str(tmp_path / "d"), src, timestamp=1000)
    assert idx.get_dimensions() == idx.dimensions == 3


def test_query_refuses_unknown_kwargs(spark, tmp_path):
    """A typo'd query knob raises instead of silently changing nothing;
    cross-type and reference driver knobs stay tolerated no-ops."""
    from tiledb_vector_search_spark.indexes import FlatIndex

    src = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])],
        "external_id long, vector array<float>",
    )
    idx = FlatIndex.ingest(spark, str(tmp_path / "kw"), src, timestamp=1000)
    q = spark.createDataFrame(
        [(0, [0.0, 0.0])], "query_id long, vector array<float>"
    )
    with pytest.raises(TypeError, match="nprobee"):
        idx.query(q, k=1, nprobee=4)
    # cross-type (nprobe on FLAT) and reference driver knobs: no-ops
    assert idx.query(q, k=1, nprobe=4, driver_mode=None, nthreads=8).count() == 1
