"""The steady-state crawl loop as ONE streaming operator:
screen → accept → grow the reference.

Composes the consumer and producer halves this module family provides
separately (``dedup_against`` + ``minhash_ingest``): each micro-batch
of candidate documents is screened against the persisted
``MinHashReference`` (drop anything near-duplicating what the corpus
already holds), the SURVIVORS fold back into the reference in the same
batch, and the sink receives both sides — so the next batch screens
against a reference that already contains this batch's accepts.  This
is the loop a training-data crawl pipeline actually runs, continuously.

Exactly-once across the whole loop: the reference commit carries the
batch's idempotency key (recorded in the committing meta flip).  A
re-delivered batch no-ops the ingest, and the accepted set the sink
receives is reconstructed EXACTLY (it is precisely the batch ids the
original commit put in the reference); the replayed ``matches`` may add
pairs among this batch's own accepted near-copies — the within-batch
blind spot below — but never changes which documents were accepted.
Sinks absorb retries by batch id as usual.

Within-batch duplicates are NOT screened here (two near-copies arriving
in the same micro-batch both survive — the reference can't see either
until the batch commits).  If intra-batch collisions matter at your
batch sizes, run ``operators.dedup.minhash_dedup`` on the batch inside
the sink, or shrink the trigger; the reference screen catches them from
the NEXT batch on either way.

Scale posture: screening is the batch-sized sign + band-join (cost ∝
increment, never the corpus); the ingest is two increment-sized writes;
``consolidate_every`` bounds the batch-dir debt with the generation
fold, off the screening path.  SINGLE-WRITER like every ingest in this
family — one crawl loop per artifact; readers are unlimited.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_crawl_loop(
    stream: DataFrame,
    reference_uri: str,
    sink: Any,
    threshold: float = 0.8,
    stream_id: str = "crawl-loop",
    consolidate_every: int | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    **trigger_kw: Any,
) -> StreamingQuery:
    """``foreachBatch`` screen-and-ingest of each candidate micro-batch.

    ``sink(accepted_df, matches_df, batch_id)`` receives the batch's
    surviving documents (the rows a downstream pipeline keeps) and the
    (new_id, ref_id, jaccard) rows that got them rejected (quarantine /
    metrics).  Both are materialized BEFORE the reference commit, so
    the sink sees exactly what was ingested.  The reference at
    ``reference_uri`` must already exist (``MinHashReference.build``
    the seed corpus first); the stream's columns must include the
    artifact's ``id_col`` and ``text_col``.
    """
    if not stream.isStreaming:
        raise ValueError("stream_crawl_loop needs a streaming DataFrame")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tiledb_vector_search_spark.operators.dedup import (
            MinHashReference,
        )

        ref = MinHashReference(batch_df.sparkSession, reference_uri)
        id_col = ref.meta["id_col"]
        key = f"{stream_id}:{batch_id}"
        # a doc is never a duplicate of ITSELF: the self-pair only
        # arises when a replayed batch screens against its own already-
        # committed copies (same id), and excluding it is semantically
        # right in every case
        matches = ref.match(batch_df, threshold=threshold).where(
            F.col("new_id") != F.col("ref_id")
        )
        # one evaluation feeds the reject filter AND the sink: the
        # match is deterministic, but double-running it doubles the
        # batch's sign/band cost for nothing
        matches = matches.localCheckpoint(eager=True)
        if key in ref.meta.get("applied_keys", []):
            # REPLAY of a committed batch (crash between the reference
            # commit and the checkpoint ack): the accepted set is
            # reconstructed EXACTLY — it is precisely the batch ids the
            # commit put in the reference.  `matches` re-screens against
            # the moved reference, so pairs among THIS batch's accepted
            # near-copies (the documented within-batch blind spot) may
            # appear that the original run didn't emit — a bounded,
            # idempotent-to-absorb superset.
            ref_ids = batch_df.sparkSession.read.parquet(
                *ref._dirs("shingles")
            ).select(id_col)
            accepted = batch_df.join(
                ref_ids, id_col, "left_semi"
            ).localCheckpoint(eager=True)
        else:
            dup_ids = matches.select(
                F.col("new_id").alias(id_col)
            ).distinct()
            accepted = batch_df.join(
                F.broadcast(dup_ids), id_col, "left_anti"
            ).localCheckpoint(eager=True)
            if not accepted.isEmpty():
                ref.add_documents(accepted, idempotency_key=key)
                if (
                    consolidate_every is not None
                    and ref.batch_debt >= consolidate_every
                ):
                    ref.consolidate()
        sink(accepted, matches, batch_id)

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_kw:
        writer = writer.trigger(**trigger_kw)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
