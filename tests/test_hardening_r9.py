"""Round-9 hardening regressions: degenerate shards, time-traveled
consolidation, re-ingest schema guards, commit-point update reads,
deterministic training samples, ragged query validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes import (
    FlatIndex,
    IVFFlatIndex,
    IVFPQIndex,
    VamanaIndex,
)


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"),
        F.col("embedding").alias("vector"),
    )


def test_vamana_one_vector_shard_builds():
    """A 1-vector shard must build an empty-adjacency graph, not crash:
    rng.choice(n-1=0, size=1) raised before the n==1 guard ran.
    Degenerate shards happen naturally (tiny k-means cells, 1-row
    corpora, post-delete consolidation)."""
    from tiledb_vector_search_spark.ml.vamana import build_vamana_graph

    adj, med = build_vamana_graph(np.array([[1.0, 2.0, 3.0]]))
    assert med == 0 and len(adj) == 1 and adj[0].size == 0


def test_vamana_one_row_corpus_ingest_and_query(spark, tmp_path):
    src = spark.createDataFrame(
        [(7, [1.0, 2.0, 3.0, 4.0])], "external_id long, vector array<float>"
    )
    idx = VamanaIndex.ingest(
        spark, str(tmp_path / "v1"), src, shards=1, timestamp=1
    )
    q = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "query_id long, vector array<float>"
    )
    rows = idx.query(q, 1).collect()
    assert [r.external_id for r in rows] == [7]


def test_vamana_l2_self_retrieval_no_nan(spark, vectors, tmp_path):
    """metric='l2' self-retrieval: the BLAS identity rounds an exact
    match to ~-1e-16; unclamped, sqrt made it NaN and Spark sorted the
    true nearest neighbor LAST, dropping it from top-k."""
    idx = VamanaIndex.ingest(
        spark, str(tmp_path / "vl2"), vectors, shards=4, timestamp=1,
        metric="l2",
    )
    q = vectors.where("external_id < 8").select(
        F.col("external_id").alias("query_id"), "vector"
    )
    rows = idx.query(q, 3, nprobe=4).where("rank = 1").collect()
    assert len(rows) == 8
    for r in rows:
        assert r.external_id == r.query_id, rows
        # the identity's rounding can leave a tiny POSITIVE residual
        # (sqrt ~1e-8); the bug was the NEGATIVE residual -> sqrt = NaN,
        # which sorts last and evicts the self-match from top-k entirely
        assert not np.isnan(r.distance) and r.distance < 1e-6


def test_consolidate_refuses_to_drop_unfolded_updates(spark, tmp_path):
    """consolidate_updates folds exactly this handle's window; update
    batches beyond it must RAISE — silently clearing them destroyed
    data the fold never saw (time-traveled handle), and folding them
    into an earlier-stamped snapshot broke time travel."""
    from tiledb_vector_search_spark.indexes import open_index

    src = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 1.0]) for i in range(6)],
        "external_id long, vector array<float>",
    )
    uri = str(tmp_path / "tt")
    FlatIndex.ingest(spark, uri, src, timestamp=100)
    latest = open_index(spark, uri)
    latest.update_batch([(50, [9.0, 9.0, 9.0, 9.0])], timestamp=200)

    # time-traveled handle: its window (100, 150] excludes batch 200
    stale = open_index(spark, uri, timestamp=150)
    with pytest.raises(ValueError, match="beyond this handle's"):
        stale.consolidate_updates(timestamp=300)
    # caller-supplied ts earlier than the newest batch: same guard
    fresh = open_index(spark, uri)
    with pytest.raises(ValueError, match="beyond this handle's"):
        fresh.consolidate_updates(timestamp=150)
    # the updates survived both refusals and a proper fold sees them
    folded = open_index(spark, uri).consolidate_updates(timestamp=400)
    ids = {r.external_id for r in folded.effective_vectors().collect()}
    assert 50 in ids


def test_reingest_schema_mismatch_raises(spark, vectors, tmp_path):
    """A second ingest at the same uri with different dims/metric/dtype
    appended a snapshot inconsistent with the stored meta — deferred
    breakage at query time.  Matching re-ingest stays allowed."""
    uri = str(tmp_path / "re")
    FlatIndex.ingest(spark, uri, vectors, timestamp=1)
    narrow = vectors.select(
        "external_id", F.slice("vector", 1, 8).alias("vector")
    )
    with pytest.raises(ValueError, match="does not match the existing"):
        FlatIndex.ingest(spark, uri, narrow, timestamp=2)
    with pytest.raises(ValueError, match="does not match the existing"):
        FlatIndex.ingest(spark, uri, vectors, metric="cosine", timestamp=2)
    with pytest.raises(ValueError, match="does not match the existing"):
        IVFFlatIndex.ingest(spark, uri, vectors, partitions=4, timestamp=2)
    # same schema: the append is legal and opens at the new snapshot
    again = FlatIndex.ingest(spark, uri, vectors, timestamp=3)
    assert again.base_ts == 3


def test_uncommitted_update_batch_is_invisible(spark, tmp_path):
    """The meta flip is the commit point: rows from an update batch
    whose parquet append landed but whose meta write crashed must stay
    invisible to queries (describe/has_updates already said so)."""
    src = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)],
        "external_id long, vector array<float>",
    )
    uri = str(tmp_path / "orph")
    idx = FlatIndex.ingest(spark, uri, src, timestamp=1)
    idx.update_batch([(0, [5.0, 5.0])], timestamp=10)
    # simulate the crashed batch: parquet rows appended, meta untouched
    orphan = spark.createDataFrame(
        [(1, [7.0, 7.0], False, 20)],
        "external_id long, vector array<float>, is_delete boolean, ts long",
    )
    orphan.write.mode("append").parquet(idx.storage.updates_path)

    reopened = FlatIndex(spark, uri)
    upd = reopened.storage.read_updates_raw().collect()
    assert {r.ts for r in upd} == {10}  # orphan ts=20 filtered out
    q = spark.createDataFrame(
        [(0, [7.0, 7.0])], "query_id long, vector array<float>"
    )
    top = reopened.query(q, 1).first()
    assert top.external_id != 1 or top.distance > 0.0
    # the SQL twin applies the same commit-point filter
    from tiledb_vector_search_spark.sql.tvf import search_index_files

    got = search_index_files(
        uri,
        np.array([0], dtype=np.int64),
        np.array([[7.0, 7.0]], dtype=np.float64),
        4,
        1,
    )
    assert all(eid != 1 or d > 0.0 for (_, eid, d, _) in got)


def test_training_sample_deterministic_without_ids(spark):
    """train_centroids_ml's no-id branch used a bare limit() — the
    task-arrival nondeterminism the adjacent ID branch deliberately
    avoids.  Two runs must produce identical centroids (also proves
    xxhash64 accepts the array column)."""
    from tiledb_vector_search_spark.ml.kmeans import train_centroids_ml

    rows = [([float(i % 7), float(i % 5), float(i)],) for i in range(500)]
    df = spark.createDataFrame(rows, "vector array<float>").repartition(8)
    c1 = train_centroids_ml(df, 4, 200, 500)
    c2 = train_centroids_ml(df, 4, 200, 500)
    np.testing.assert_array_equal(c1, c2)


def test_pq_retrain_consolidation_deterministic(spark, vectors, tmp_path):
    """consolidate_updates(retrain_index=True) trains codebooks from a
    hash-ordered take, not a bare limit() — two consolidations of the
    same state must produce bit-identical codebooks."""
    import shutil

    uri = str(tmp_path / "pq")
    IVFPQIndex.ingest(
        spark, uri, vectors, partitions=4, num_subspaces=8, timestamp=1
    )
    idx = IVFPQIndex(spark, uri)
    idx.update_batch([(999_999, [0.5] * 64)], timestamp=2)
    uri2 = str(tmp_path / "pq2")
    shutil.copytree(uri, uri2)
    a = IVFPQIndex(spark, uri).consolidate_updates(
        timestamp=5, retrain_index=True, partitions=4
    )
    b = IVFPQIndex(spark, uri2).consolidate_updates(
        timestamp=5, retrain_index=True, partitions=4
    )
    np.testing.assert_array_equal(a.codebooks(), b.codebooks())


def test_ragged_query_batch_raises(spark, vectors, tmp_path):
    """A batch whose FIRST row has the right width but a later row
    doesn't previously passed validation and failed deep in the kernel
    (or silently truncated in zip_with)."""
    idx = FlatIndex.ingest(spark, str(tmp_path / "rag"), vectors, timestamp=1)
    ragged = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [0.0] * 32)],
        "query_id long, vector array<float>",
    )
    with pytest.raises(ValueError, match="ragged query batch"):
        idx.query(ragged, 3)
