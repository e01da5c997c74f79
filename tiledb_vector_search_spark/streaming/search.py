"""Structured Streaming top-k search over a query stream.

Reference status (SURVEY §2.12): the reference has no streaming engine;
its query model is batch-only (``Index.query`` over a 2D query matrix).
The Spark-native extension: a continuous stream of query vectors
(``readStream`` from Kafka/files/rate) searched against a built index
per micro-batch, results appended to any streaming sink.  The index is
re-opened per batch by TIMESTAMP resolution, so a concurrent
``consolidate_updates``/ingest shows up at the next micro-batch boundary
— queries never see a half-written snapshot (snapshots are immutable;
the meta pointer flips atomically).

Per micro-batch the work is exactly one batch-query plan (driver-bounded
small batches or the distributed ``strategy="join"`` path for large
ones), so throughput scales with the cluster the same way batch queries
do; Structured Streaming adds only the trigger cadence and exactly-once
sink semantics (checkpointed offsets + idempotent-by-batch-id sinks).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tiledb_vector_search_spark.schemas import (
    QUERY_ID_COL,
    VECTOR_COL,
    integral_id_col,
)


def stream_search_index(
    stream: DataFrame,
    index_uri: str,
    k: int,
    sink: Any,
    checkpoint_dir: str | None = None,
    query_id_col: str = QUERY_ID_COL,
    vector_col: str = VECTOR_COL,
    available_now: bool = True,
    query_kwargs: dict[str, Any] | None = None,
    **trigger_kw: Any,
) -> StreamingQuery:
    """``foreachBatch`` top-k search of each query micro-batch.

    ``sink(result_df, batch_id)`` receives the (query_id, external_id,
    distance, rank) result of each micro-batch — write it to a table,
    Kafka topic, or memory sink as the application needs; results carry
    the batch's query ids so late/duplicate batches are idempotent to
    re-deliver.  ``query_kwargs`` forwards nprobe/k_factor/strategy to
    ``Index.query``.
    """
    if not stream.isStreaming:
        raise ValueError("stream_search_index needs a streaming DataFrame")
    qkw = dict(query_kwargs or {})

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tiledb_vector_search_spark.indexes import open_index

        idx = open_index(batch_df.sparkSession, index_uri)
        q = batch_df.select(
            integral_id_col(
                batch_df, query_id_col, "stream_search_index"
            ).alias(QUERY_ID_COL),
            F.col(vector_col).cast("array<float>").alias(VECTOR_COL),
        )
        sink(idx.query(q, k, **qkw), batch_id)

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_kw:
        writer = writer.trigger(**trigger_kw)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
