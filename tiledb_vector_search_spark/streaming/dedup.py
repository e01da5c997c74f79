"""Streaming exact deduplication — the online form of the batch
``operators.dedup.exact_duplicates`` keep-first decision.

A pretraining ingest that tails a firehose must drop repeats as they
arrive, not in a nightly batch.  Spark mapping:
``dropDuplicatesWithinWatermark`` keyed on the content hash, so the
dedup state store holds only hashes younger than the watermark delay —
bounded state at any throughput (a plain ``dropDuplicates`` on an
unbounded stream grows state forever).  Keys are 128-bit md5 hashes,
never the document text, so state and shuffle stay small — the same
posture as the batch dedup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival of each distinct ``text_col`` value seen
    within the watermark horizon; later byte-identical repeats are dropped.

    Exactness window = ``delay``: a repeat arriving later than the delay
    after the watermark passed its original is admitted again (the price of
    bounded state — tune ``delay`` to the corpus's duplicate locality).
    """
    if not stream.isStreaming:
        raise ValueError("dedup_stream needs a streaming DataFrame")
    hashed = stream.withColumn("__text_hash", F.md5(F.col(text_col)))
    return (
        hashed.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__text_hash"])
        .drop("__text_hash")
    )
