"""Structured Streaming incremental dedup against a reference corpus.

The streaming twin of ``operators/dedup.py:minhash_dedup_against`` /
``MinHashReference.match`` — the crawl-ingest steady state: a continuous
stream of NEW documents, each micro-batch checked against the persisted
reference-corpus MinHash artifact ("drop anything already in the
training set") before it is admitted.

Snapshot discipline (the ``stream_search_index`` / BM25 pattern): the
artifact is RE-OPENED per micro-batch through its meta pointer, so a
reference grown concurrently by ``MinHashReference.add_documents``
becomes visible at the next batch boundary and a batch never reads a
half-committed increment (staged batch dirs are invisible until the
atomic meta flip).

Exactly-once: Structured Streaming checkpoints source offsets, and the
match output for a batch is a pure deterministic function of (batch
docs, committed artifact state) — a re-delivered batch re-produces the
identical (new_id, ref_id, jaccard) rows, so idempotent sinks (upsert
on (new_id, ref_id), overwrite-by-batch-id dirs) absorb retries.

Scale posture: per micro-batch the work is the batch-sized shingle/
sign/band pass plus a band-key equi-join against the artifact (the
reference never re-signs), i.e. cost ∝ increment — the property the
batch operator's docstring promises, delivered continuously.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_dedup_against(
    stream: DataFrame,
    reference_uri: str,
    sink: Any,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    **trigger_kw: Any,
) -> StreamingQuery:
    """``foreachBatch`` near-dup screening of each document micro-batch.

    ``sink(matches_df, batch_id)`` receives the (new_id, ref_id,
    jaccard) rows of each micro-batch — route them to a quarantine
    table, an anti-join filter, or a metrics sink as the pipeline needs.
    """
    if not stream.isStreaming:
        raise ValueError("stream_dedup_against needs a streaming DataFrame")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tiledb_vector_search_spark.operators.dedup import (
            MinHashReference,
        )

        # per-batch re-open: the meta pointer resolves the newest
        # committed reference state (concurrent add_documents lands at
        # the next boundary, never mid-batch)
        ref = MinHashReference(batch_df.sparkSession, reference_uri)
        sink(
            ref.match(
                batch_df, threshold=threshold,
                text_col=text_col, id_col=id_col,
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
