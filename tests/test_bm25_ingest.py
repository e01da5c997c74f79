"""Streaming BM25 ingest: exactly-once micro-batch growth of the
postings artifact + consolidation-in-the-loop."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.operators.retrieval import BM25Index
from tiledb_vector_search_spark.streaming.bm25_ingest import (
    stream_bm25_ingest,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def queries(docs):
    return docs.where("doc_id < 10").select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 200).alias("query_text"),
    )


def _topk(idx, queries, k=10):
    return sorted(
        (r.query_id, r.doc_id, str(r.score), r.rank)
        for r in idx.query(queries, k=k).collect()
    )


def test_add_documents_idempotency_key(spark, docs, queries, tmp_path):
    """A re-delivered key is a no-op in data AND meta; a fresh key
    applies; the ledger survives consolidate()."""
    seed = docs.where("doc_id % 2 = 0")
    inc_a = docs.where("doc_id % 4 = 1")
    inc_b = docs.where("doc_id % 4 = 3")
    uri = str(tmp_path / "idem")
    idx = BM25Index.build(spark, uri, seed)
    idx.add_documents(inc_a, idempotency_key="s:0")
    after_first = _topk(idx, queries)
    meta_first = dict(idx.meta)
    # same key again — with DIFFERENT (even colliding) data: must not run
    idx.add_documents(inc_a, idempotency_key="s:0")
    assert dict(idx.meta) == meta_first
    assert _topk(idx, queries) == after_first
    # a reopened handle sees the committed ledger too
    reopened = BM25Index(spark, uri)
    reopened.add_documents(inc_a, idempotency_key="s:0")
    assert dict(reopened.meta) == meta_first
    # a new key applies and equals the fresh union build
    reopened.add_documents(inc_b, idempotency_key="s:1")
    fresh = BM25Index.build(
        spark, str(tmp_path / "fresh"), seed.unionByName(inc_a).unionByName(inc_b)
    )
    assert _topk(reopened, queries) == _topk(fresh, queries)
    # the ledger survives the fold (meta spread) — and the fold doesn't
    # change scores
    before_fold = _topk(reopened, queries)
    reopened.consolidate()
    assert reopened.meta.get("applied_keys") == ["s:0", "s:1"]
    assert _topk(reopened, queries) == before_fold
    reopened.add_documents(inc_b, idempotency_key="s:1")  # still a no-op
    assert _topk(reopened, queries) == before_fold


def test_stream_bm25_ingest_e2e(spark, docs, queries, tmp_path):
    """2 file-source micro-batches fold into the artifact; the result
    equals a fresh build over seed+stream; a checkpointed restart with
    no new files changes nothing; a simulated re-delivery of the last
    batch is a no-op via its idempotency key."""
    seed = docs.where("doc_id % 2 = 0")
    b0 = docs.where("doc_id % 4 = 1")
    b1 = docs.where("doc_id % 4 = 3")
    uri = str(tmp_path / "idx")
    BM25Index.build(spark, uri, seed)

    in_dir = tmp_path / "in"
    b0.coalesce(1).write.parquet(str(in_dir / "batch=0"))
    b1.coalesce(1).write.parquet(str(in_dir / "batch=1"))

    def make_stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "batch=*"))
        )

    ckpt = str(tmp_path / "ckpt")
    sq = stream_bm25_ingest(make_stream(), uri, checkpoint_dir=ckpt)
    sq.awaitTermination()

    idx = BM25Index(spark, uri)
    fresh = BM25Index.build(
        spark, str(tmp_path / "fresh"),
        seed.unionByName(b0).unionByName(b1),
    )
    streamed = _topk(idx, queries)
    assert streamed == _topk(fresh, queries)
    assert len(idx.meta.get("applied_keys", [])) == 2
    assert idx.describe()["batch_debt"] == 2

    # restart from the checkpoint with no new input: no batches fire
    meta_before = dict(idx.meta)
    sq2 = stream_bm25_ingest(make_stream(), uri, checkpoint_dir=ckpt)
    sq2.awaitTermination()
    idx = BM25Index(spark, uri)
    assert dict(idx.meta) == meta_before

    # simulated crash-between-commit-and-ack: foreachBatch re-runs the
    # last batch id — the recorded key makes it a no-op
    last_key = idx.meta["applied_keys"][-1]
    idx.add_documents(b1, idempotency_key=last_key)
    assert dict(idx.meta) == meta_before
    assert _topk(idx, queries) == streamed


def test_stream_bm25_ingest_consolidate_every(spark, docs, queries, tmp_path):
    """consolidate_every folds the debt inside the stream loop; scores
    unchanged, keys preserved, debt bounded."""
    seed = docs.where("doc_id % 2 = 0")
    b0 = docs.where("doc_id % 4 = 1")
    b1 = docs.where("doc_id % 4 = 3")
    uri = str(tmp_path / "idx")
    BM25Index.build(spark, uri, seed)

    in_dir = tmp_path / "in"
    b0.coalesce(1).write.parquet(str(in_dir / "batch=0"))
    b1.coalesce(1).write.parquet(str(in_dir / "batch=1"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch=*"))
    )
    sq = stream_bm25_ingest(
        stream, uri, consolidate_every=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    sq.awaitTermination()

    idx = BM25Index(spark, uri)
    assert idx.describe()["batch_debt"] == 0  # folded at batch 2
    assert int(idx.meta.get("generation", 0)) >= 1
    assert len(idx.meta.get("applied_keys", [])) == 2
    fresh = BM25Index.build(
        spark, str(tmp_path / "fresh"),
        seed.unionByName(b0).unionByName(b1),
    )
    assert _topk(idx, queries) == _topk(fresh, queries)


def test_stream_bm25_ingest_rejects_batch_df(spark, docs):
    with pytest.raises(ValueError, match="streaming"):
        stream_bm25_ingest(docs, "/tmp/nope")


def test_stream_bm25_search_e2e(spark, docs, queries, tmp_path):
    """Two query micro-batches ranked against the artifact match the
    batch query exactly; a DML commit between batches is visible to the
    NEXT batch (per-batch snapshot re-resolution)."""
    from tiledb_vector_search_spark.streaming.bm25_search import (
        stream_bm25_search,
    )

    seed = docs.where("doc_id % 2 = 0")
    inc = docs.where("doc_id % 2 = 1")
    uri = str(tmp_path / "idx")
    idx = BM25Index.build(spark, uri, seed)

    qrows = queries.collect()
    q0, q1 = qrows[: len(qrows) // 2], qrows[len(qrows) // 2 :]
    in_dir = tmp_path / "qin"
    spark.createDataFrame(q0).coalesce(1).write.parquet(str(in_dir / "b=0"))

    got: dict[int, list] = {}

    def sink(df, batch_id):
        got[batch_id] = sorted(
            (r.query_id, r.doc_id, str(r.score), r.rank) for r in df.collect()
        )

    def make_stream():
        return (
            spark.readStream.schema("query_id long, query_text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "b=*"))
        )

    ckpt = str(tmp_path / "ckpt")
    stream_bm25_search(make_stream(), uri, 10, sink, checkpoint_dir=ckpt)
    [q.awaitTermination() for q in spark.streams.active]
    q0_df = spark.createDataFrame(q0)
    assert got[0] == sorted(
        (r.query_id, r.doc_id, str(r.score), r.rank)
        for r in idx.query(q0_df, k=10).collect()
    )

    # DML between batches: grow the corpus, then stream the second
    # query batch — it must rank against the GROWN artifact
    idx.add_documents(inc)
    spark.createDataFrame(q1).coalesce(1).write.parquet(str(in_dir / "b=1"))
    stream_bm25_search(make_stream(), uri, 10, sink, checkpoint_dir=ckpt)
    [q.awaitTermination() for q in spark.streams.active]
    q1_df = spark.createDataFrame(q1)
    reopened = BM25Index(spark, uri)
    assert got[1] == sorted(
        (r.query_id, r.doc_id, str(r.score), r.rank)
        for r in reopened.query(q1_df, k=10).collect()
    )
    # sanity: the growth actually changed the second batch's answers
    assert got[1] != sorted(
        (r.query_id, r.doc_id, str(r.score), r.rank)
        for r in BM25Index.build(
            spark, str(tmp_path / "seed_only"), seed
        ).query(q1_df, k=10).collect()
    )


def test_stream_bm25_ingest_with_session(spark, docs, queries, tmp_path):
    """session=: the stream's batches renew ONE writer lease instead of
    claiming/releasing per batch (r11 amortization).  Results equal the
    fresh build; while the session is open other writers are excluded;
    the lease releases with the session, not with a batch."""
    import posixpath

    from tiledb_vector_search_spark.storage import (
        ConcurrentWriterError,
        HadoopFS,
        WRITER_LOCK_FILE,
        writer_lease,
    )

    seed = docs.where("doc_id % 2 = 0")
    b0 = docs.where("doc_id % 4 = 1")
    b1 = docs.where("doc_id % 4 = 3")
    uri = str(tmp_path / "idx")
    BM25Index.build(spark, uri, seed)
    in_dir = tmp_path / "in"
    b0.coalesce(1).write.parquet(str(in_dir / "batch=0"))
    b1.coalesce(1).write.parquet(str(in_dir / "batch=1"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch=*"))
    )
    fs = HadoopFS(spark, uri)
    lock = posixpath.join(uri, WRITER_LOCK_FILE)
    with writer_lease(fs, uri) as session:
        sq = stream_bm25_ingest(
            stream, uri, checkpoint_dir=str(tmp_path / "ckpt"),
            session=session,
        )
        sq.awaitTermination()
        # the session lease survived both batches under OUR nonce
        held = json.loads(fs.read_text(lock))
        assert held["nonce"] == session.nonce
        # and other writers are still excluded mid-session
        import threading

        err = []

        def compete():
            try:
                BM25Index(spark, uri).add_documents(
                    spark.createDataFrame(
                        [(999, "intruder")], "doc_id long, text string"
                    )
                )
            except ConcurrentWriterError as exc:
                err.append(exc)

        t = threading.Thread(target=compete)
        t.start()
        t.join()
        assert err, "competing writer must be excluded during the session"
    assert not fs.exists(lock)  # released with the session
    idx = BM25Index(spark, uri)
    fresh = BM25Index.build(
        spark, str(tmp_path / "fresh"),
        seed.unionByName(b0).unionByName(b1),
    )
    assert _topk(idx, queries) == _topk(fresh, queries)
    assert len(idx.meta.get("applied_keys", [])) == 2


def test_stream_session_zombie_fails_loudly(spark, docs, tmp_path):
    """A session whose lease was taken over (zombie stream) must fail
    its next batch BEFORE writing — the r10 zombie contract holds under
    the amortized session too."""
    import posixpath

    from tiledb_vector_search_spark.storage import (
        HadoopFS,
        WRITER_LOCK_FILE,
        writer_lease,
    )

    seed = docs.where("doc_id % 2 = 0")
    b0 = docs.where("doc_id % 4 = 1")
    uri = str(tmp_path / "idx")
    BM25Index.build(spark, uri, seed)
    in_dir = tmp_path / "in"
    b0.coalesce(1).write.parquet(str(in_dir / "batch=0"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch=*"))
    )
    fs = HadoopFS(spark, uri)
    lock = posixpath.join(uri, WRITER_LOCK_FILE)
    with writer_lease(fs, uri) as session:
        meta_before = dict(BM25Index(spark, uri).meta)
        # takeover while the zombie sleeps: a contender holds a fresh lock
        fs.write_text_atomic(
            lock,
            json.dumps(
                {"nonce": "contender", "acquired_ms": 1, "ttl_ms": 10**9}
            ),
        )
        # a real zombie paused long enough for a takeover is past the
        # renew freshness window by definition — age the stamp so the
        # next adopted renew round-trips the disk (the fence remains the
        # backstop for an inside-window protocol-violating thief; see
        # test_thief_inside_freshness_window_is_caught_by_the_fence)
        session._stamped_at -= 5.0
        sq = stream_bm25_ingest(
            stream, uri, checkpoint_dir=str(tmp_path / "ckpt"),
            session=session,
        )
        with pytest.raises(Exception, match="taken over"):
            sq.awaitTermination()
        assert dict(BM25Index(spark, uri).meta) == meta_before
    fs.delete(lock, recursive=False)
