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
