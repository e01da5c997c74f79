"""Structured Streaming ingest into the persisted MinHash reference.

The dedup twin of ``streaming/bm25_ingest.py`` and the producer-side
complement of ``streaming/dedup_against.py``: a stream of ACCEPTED
documents (e.g. everything a crawl batch kept after screening) folds
into the ``MinHashReference`` artifact one crash-atomic
``add_documents`` batch per micro-batch, so the NEXT screening batch
matches against a reference that already contains them — the
steady-state crawl loop (screen → accept → grow the reference) as one
live pipeline, with ``stream_dedup_against`` on the consumer side.

Exactly-once: identical discipline to the BM25 twin — each micro-batch
commits under an ``idempotency_key`` (``<stream_id>:<batch_id>``)
recorded in the same atomic meta flip as the batch, so foreachBatch's
at-least-once re-delivery is a no-op.  ``consolidate_every`` folds the
band/shingle batch-dir debt down with generation pointers once it
reaches the threshold, keeping the small-files + per-match multi-dir
union debt bounded forever; readers re-resolve at their next batch.

Scale posture: per micro-batch the work is one increment-sized shingle
+ sign + two increment-sized writes (the committed reference is never
re-signed); the consolidate fold is reference-sized but amortized over
``consolidate_every`` increments and off the match path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tiledb_vector_search_spark.storage import adopt_writer_session


def stream_minhash_ingest(
    stream: DataFrame,
    reference_uri: str,
    stream_id: str = "minhash-ingest",
    consolidate_every: int | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    session: Any = None,
    **trigger_kw: Any,
) -> StreamingQuery:
    """Fold each accepted-document micro-batch into the MinHash
    reference at ``reference_uri`` (must already exist —
    ``MinHashReference.build`` the seed corpus first; the stream's
    columns must include the artifact's ``id_col`` and ``text_col``).
    ``session``: an externally-held :class:`~tiledb_vector_search_spark.
    storage.LeaseHandle` (from ``writer_lease`` around the stream) —
    batches then RENEW the one session lease instead of claiming and
    releasing per micro-batch (~0.2 s/batch measured), and a takeover
    mid-stream still fails the next batch loudly before it writes.
    """
    if not stream.isStreaming:
        raise ValueError("stream_minhash_ingest needs a streaming DataFrame")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tiledb_vector_search_spark.operators.dedup import (
            MinHashReference,
        )

        ref = MinHashReference(batch_df.sparkSession, reference_uri)
        if session is not None:
            adopt_writer_session(ref, session)
        ref.add_documents(
            batch_df, idempotency_key=f"{stream_id}:{batch_id}"
        )
        if (
            consolidate_every is not None
            and ref.batch_debt >= consolidate_every
        ):
            ref.consolidate()

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_kw:
        writer = writer.trigger(**trigger_kw)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
