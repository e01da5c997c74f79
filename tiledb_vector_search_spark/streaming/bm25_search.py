"""Structured Streaming BM25 search over a query-text stream.

The lexical twin of ``streaming/search.py`` (ANN) and the consumer-side
complement of ``streaming/bm25_ingest.py``: a continuous stream of text
queries (``readStream`` from Kafka/files/rate) ranked against the
persisted BM25 artifact per micro-batch.  The index handle is re-opened
per batch, so concurrent DML — an ``add_documents`` increment, a
``remove_documents`` delete batch, a ``consolidate()`` generation flip
— lands at the next micro-batch boundary; queries never see a
half-written snapshot (batch/generation dirs are immutable; the meta
pointer flips atomically).

Per micro-batch the work is exactly one batch-query plan — the kernel
strategy for bounded batches, the fully distributed join plan above the
nq/vocab caps, chosen by the same ``auto`` probes as batch queries — so
streaming adds only the trigger cadence and checkpointed exactly-once
sink semantics.  Results carry the batch's query ids, so re-delivered
batches are idempotent to re-process at the sink.

Reference status (SURVEY §2.12): the reference's query model is
batch-only; this is Spark-native extension surface, like the ANN twin.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tiledb_vector_search_spark.schemas import QUERY_ID_COL


def stream_bm25_search(
    stream: DataFrame,
    index_uri: str,
    k: int,
    sink: Any,
    checkpoint_dir: str | None = None,
    query_id_col: str = QUERY_ID_COL,
    query_text_col: str = "query_text",
    available_now: bool = True,
    query_kwargs: dict[str, Any] | None = None,
    **trigger_kw: Any,
) -> StreamingQuery:
    """``foreachBatch`` BM25 top-k of each query micro-batch.

    ``sink(result_df, batch_id)`` receives the (query_id, doc_id,
    score, rank) frame of each micro-batch; ``query_kwargs`` forwards
    ``k1``/``b``/``strategy`` to ``BM25Index.query``.
    """
    if not stream.isStreaming:
        raise ValueError("stream_bm25_search needs a streaming DataFrame")
    qkw = dict(query_kwargs or {})

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tiledb_vector_search_spark.operators.retrieval import BM25Index

        idx = BM25Index(batch_df.sparkSession, index_uri)
        q = batch_df.select(
            F.col(query_id_col).alias(QUERY_ID_COL),
            F.col(query_text_col).alias("query_text"),
        )
        sink(
            idx.query(
                q, k=k, query_id_col=QUERY_ID_COL,
                query_text_col="query_text", **qkw,
            ),
            batch_id,
        )

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_kw:
        writer = writer.trigger(**trigger_kw)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
