"""Structured Streaming ingestion into the updates log (+ windowed rollups).

Reference status (SURVEY §2.12): the reference has no streaming engine — its
nearest analogue is the sparse ``updates`` array receiving upserts plus
periodic ``consolidate_updates`` (``index.py:503-577``), i.e. an
incremental-batch pattern.  Spark mapping: a ``readStream`` source feeding
``foreachBatch`` micro-batches into the same updates log the batch DML path
writes (``Index.update_batch``), with latest-wins resolution at read
(``IndexStorage.read_updates``) providing MERGE semantics.  The log's
auto-compaction and ``consolidate_updates`` then work unchanged — streaming
and batch DML share one code path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tiledb_vector_search_spark.storage import adopt_writer_session

from tiledb_vector_search_spark.schemas import (
    ID_COL,
    VECTOR_COL,
    integral_id_col,
)


def stream_updates_to_index(
    stream: DataFrame,
    index_uri: str,
    checkpoint_dir: str,
    id_col: str = ID_COL,
    vector_col: str = VECTOR_COL,
    delete_col: str | None = None,
    available_now: bool = True,
    session: Any = None,
    **trigger_kw: Any,
) -> StreamingQuery:
    """``writeStream.foreachBatch`` → upserts/tombstones into the index.

    Each micro-batch becomes one timestamped updates batch (exactly the unit
    the reference's update fragments model), so time travel sees streaming
    writes the same way it sees batch DML.  ``delete_col`` (boolean) marks
    tombstone rows; the rest are upserts.

    ``available_now=True`` drains the available input then stops — the
    incremental-batch pattern; pass ``processingTime='...'`` via
    ``trigger_kw`` for continuous micro-batching.
    
    ``session``: an externally-held :class:`~tiledb_vector_search_spark.
    storage.LeaseHandle` (from ``writer_lease`` around the stream) —
    batches then RENEW the one session lease instead of claiming and
    releasing per micro-batch (~0.2 s/batch measured), and a takeover
    mid-stream still fails the next batch loudly before it writes.
    """
    if not stream.isStreaming:
        raise ValueError("stream_updates_to_index needs a streaming DataFrame")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from tiledb_vector_search_spark.indexes import open_index

        idx = open_index(batch_df.sparkSession, index_uri)
        if session is not None:
            adopt_writer_session(idx, session)
        # ONE mixed upsert/tombstone updates batch per micro-batch, written
        # distributed via merge_batch — no driver collect of delete ids
        if delete_col is not None:
            merged = batch_df.select(
                integral_id_col(
                    batch_df, id_col, "stream_updates_to_index"
                ).alias(ID_COL),
                F.when(
                    ~F.col(delete_col), F.col(vector_col).cast("array<float>")
                ).alias(VECTOR_COL),
                F.col(delete_col).cast("boolean").alias("is_delete"),
            )
        else:
            merged = batch_df.select(
                integral_id_col(
                    batch_df, id_col, "stream_updates_to_index"
                ).alias(ID_COL),
                F.col(vector_col).cast("array<float>").alias(VECTOR_COL),
                F.lit(False).alias("is_delete"),
            )
        if merged.isEmpty():
            return
        idx.merge_batch(merged)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    # an explicit trigger wins over the available_now DEFAULT — with the
    # branches inverted, a caller passing processingTime=... (the
    # documented continuous mode) silently got a drain-and-STOP stream;
    # every sibling stream operator checks trigger_kw first
    if trigger_kw:
        writer = writer.trigger(**trigger_kw)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_rollup_stream(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of the batch ``events_hourly_rollup`` query: tumbling
    1-hour window + watermark for late data (SURVEY §2.12 mapping).

    Returns a streaming DataFrame ready for ``writeStream`` (append mode
    emits a window once the watermark passes its end).
    """
    if not events.isStreaming:
        raise ValueError("hourly_rollup_stream needs a streaming DataFrame")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("win"), F.col(type_col))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(10,2)"))
            .cast("decimal(38,2)")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            F.col(type_col),
            "n",
            "total_value",
        )
    )
