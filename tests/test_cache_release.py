"""Dedup pipelines must not leak CacheManager entries (VERDICT r3 #1).

The pipelines persist intermediates (shingled corpus, gated candidate
pairs) for reuse between the candidate and verify stages.  With the
default ``materialize=True`` they eagerly checkpoint the small verified
result and unpersist those intermediates before returning — a long-lived
session (bench harness, pipeline service) must end each invocation with
an empty DataFrame cache, or executor storage accumulates and GC
pressure bleeds into later jobs.

``localCheckpoint`` blocks are intentionally NOT asserted on: they are
ContextCleaner-managed (freed when the result DataFrame is GC'd), unlike
CacheManager entries which live until an explicit unpersist.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.operators import dedup as DD


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


@pytest.fixture()
def clean_cache(spark):
    spark.catalog.clearCache()
    assert _cache_manager(spark).isEmpty()
    yield
    spark.catalog.clearCache()


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def test_minhash_dedup_releases_caches(spark, sf_dir, clean_cache):
    out = DD.minhash_dedup(
        _docs(spark, sf_dir), num_perm=16, bands=4, threshold=0.9
    )
    out.count()
    assert _cache_manager(spark).isEmpty(), "minhash_dedup leaked cached frames"


def test_minhash_candidates_only_releases_caches(spark, sf_dir, clean_cache):
    out = DD.minhash_dedup(
        _docs(spark, sf_dir), num_perm=16, bands=4, verify=False
    )
    out.count()
    assert _cache_manager(spark).isEmpty()


def test_ngram_jaccard_dedup_releases_caches(spark, sf_dir, clean_cache):
    out = DD.ngram_jaccard_dedup(_docs(spark, sf_dir), threshold=0.8)
    out.count()
    assert _cache_manager(spark).isEmpty(), (
        "ngram_jaccard_dedup leaked cached frames"
    )


def test_embedding_lsh_releases_caches(spark, sf_dir, clean_cache):
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    out = DD.embedding_near_duplicates_lsh(vecs, threshold=0.99)
    out.count()
    assert _cache_manager(spark).isEmpty(), (
        "embedding_near_duplicates_lsh leaked cached frames"
    )


def test_vamana_ingest_releases_graph_cache(spark, sf_dir, clean_cache, tmp_path):
    from tiledb_vector_search_spark.indexes import VamanaIndex

    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )
    VamanaIndex.ingest(spark, str(tmp_path / "vamcache"), src, shards=2)
    assert _cache_manager(spark).isEmpty(), "Vamana ingest leaked the graph cache"


def test_materialize_false_keeps_lazy_plan(spark, sf_dir, clean_cache):
    """materialize=False returns the un-checkpointed plan (for inspection);
    the candidate persist is then caller-managed."""
    out = DD.minhash_dedup(
        _docs(spark, sf_dir), num_perm=16, bands=4, threshold=0.9,
        materialize=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the lazy form still shows the verify join, not a checkpoint scan
    assert "Scan ExistingRDD" not in plan
    assert not _cache_manager(spark).isEmpty()  # caller-managed caches live


def test_cross_corpus_dedup_releases_caches(spark, sf_dir, clean_cache):
    docs = _docs(spark, sf_dir)
    out = DD.minhash_dedup_against(
        docs.where("doc_id >= 100"), docs.where("doc_id < 100"),
        num_perm=16, bands=8, threshold=0.8,
    )
    out.count()
    assert _cache_manager(spark).isEmpty(), (
        "minhash_dedup_against leaked cached frames"
    )
