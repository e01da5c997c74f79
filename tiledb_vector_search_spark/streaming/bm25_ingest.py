"""Structured Streaming ingest into the persisted BM25 artifact.

The lexical twin of ``streaming/updates.py`` (ANN index growth) and the
producer-side complement of ``streaming/dedup_against.py``: a continuous
stream of NEW documents folds into the ``BM25Index`` postings artifact
one crash-atomic ``add_documents`` batch per micro-batch, so lexical
retrieval (``BM25Index.query``, the ``bm25_search`` SQL TVF, and the
streaming search twin) sees each crawl increment at the next batch
boundary — the reference's ingest-then-query lifecycle
(``ingestion.py`` → ``index.query``) re-expressed as a live pipeline.

Exactly-once: ``foreachBatch`` gives at-least-once delivery — after a
crash between the artifact commit and the checkpoint acknowledgement,
the SAME batch id is re-run.  Each batch therefore commits under an
``idempotency_key`` (``<stream_id>:<batch_id>``) recorded in the same
atomic meta flip as the batch itself; a re-delivered batch is a no-op.
This is end-to-end exactly-once WITHOUT a transactional sink, because
the artifact's single-pointer commit discipline doubles as the
transaction log.

Consolidation-in-the-loop: every increment adds one batch-dir pair of
debt (small files + a per-query vocab re-aggregate).  When
``consolidate_every`` is set, the stream folds the debt down with
``BM25Index.consolidate()`` once it reaches that many committed
batches — the crawl pipeline's steady state is then bounded debt
forever, with readers never blocked (generation pointers swap
atomically underneath them).

Scale posture: per micro-batch the work is one batch-sized tokenize +
two batch-sized writes (cost ∝ increment; the corpus never
re-tokenizes); the consolidate fold is corpus-sized but amortized over
``consolidate_every`` increments and off the query path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tiledb_vector_search_spark.storage import adopt_writer_session


def stream_bm25_ingest(
    stream: DataFrame,
    index_uri: str,
    stream_id: str = "bm25-ingest",
    consolidate_every: int | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    session: Any = None,
    **trigger_kw: Any,
) -> StreamingQuery:
    """Fold each document micro-batch into the BM25 artifact at
    ``index_uri`` (which must already exist — ``BM25Index.build`` the
    empty-or-seed corpus first; the stream's columns must include the
    index's ``id_col`` and ``text_col``).

    ``stream_id`` namespaces the idempotency keys — it distinguishes a
    RESUMED or REPLACED stream (new checkpoint, same artifact) from a
    re-delivered batch.  It does NOT make concurrent writers safe: the
    artifact is SINGLE-WRITER (``add_documents`` is a read-modify-write
    of the meta pointer — two interleaved writers can mint the same
    batch id and the later meta flip drops the earlier batch).  To
    ingest several sources, union them upstream into one stream, or
    run the streams strictly one at a time.  Readers (queries, the
    search twin) are unlimited and never block.
    
    ``session``: an externally-held :class:`~tiledb_vector_search_spark.
    storage.LeaseHandle` (from ``writer_lease`` around the stream) —
    batches then RENEW the one session lease instead of claiming and
    releasing per micro-batch (~0.2 s/batch measured), and a takeover
    mid-stream still fails the next batch loudly before it writes.
    """
    if not stream.isStreaming:
        raise ValueError("stream_bm25_ingest needs a streaming DataFrame")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tiledb_vector_search_spark.operators.retrieval import BM25Index

        # per-batch re-open: DML the application committed between
        # batches (deletes, a consolidate — sequenced with this writer,
        # per the single-writer contract) resolves at this boundary
        idx = BM25Index(batch_df.sparkSession, index_uri)
        if session is not None:
            adopt_writer_session(idx, session)
        idx.add_documents(
            batch_df, idempotency_key=f"{stream_id}:{batch_id}"
        )
        if (
            consolidate_every is not None
            and idx.batch_debt >= consolidate_every
        ):
            idx.consolidate()

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_kw:
        writer = writer.trigger(**trigger_kw)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
