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
receives is reconstructed EXACTLY from the commit's own ids record
(``MinHashReference.accepted_ids_for_key`` — an increment-sized read;
pre-record artifacts fall back to a shingle-tree semi-join); the
replayed ``matches`` may add pairs among this batch's own accepted
near-copies but never changes which documents were accepted.  Sinks
absorb retries by batch id as usual.

Within-batch duplicates: by default two near-copies arriving in the
same micro-batch both survive (the reference can't see either until
the batch commits).  ``screen_within_batch=True`` closes this: the
batch is first collapsed to one CANONICAL survivor per intra-batch
near-dup group (``minhash_dedup`` with the artifact's own signing
family + transitive closure, canonical = min id), and only canonicals
face the reference screen.  A group whose canonical is rejected by the
reference is dropped entirely — its members were near-copies of a
near-copy of the corpus, and admitting them would re-open the
within-batch hole one hop out.  The intra rejections are reported to
the sink in ``matches`` alongside the reference rejections, oriented
(new_id = dropped doc, ref_id = the batch doc it duplicated — which
may itself have been dropped further down a chain).  At real crawl
batch sizes (10⁵–10⁶ docs per trigger) intra-batch duplication is
common; the screen costs one batch-sized LSH pass (∝ increment, never
the corpus).

Scale posture: screening is the batch-sized sign + band-join (cost ∝
increment, never the corpus); the ingest is two increment-sized writes;
``consolidate_every`` bounds the batch-dir debt with the generation
fold, off the screening path.  SINGLE-WRITER like every ingest in this
family — one crawl loop per artifact (now ENFORCED: a concurrent
writer's flip raises ``ConcurrentWriterError`` instead of silently
dropping a batch); readers are unlimited.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tiledb_vector_search_spark.storage import adopt_writer_session


def stream_crawl_loop(
    stream: DataFrame,
    reference_uri: str,
    sink: Any,
    threshold: float = 0.8,
    stream_id: str = "crawl-loop",
    screen_within_batch: bool = False,
    consolidate_every: int | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    session: Any = None,
    **trigger_kw: Any,
) -> StreamingQuery:
    """``foreachBatch`` screen-and-ingest of each candidate micro-batch.

    ``sink(accepted_df, matches_df, batch_id)`` receives the batch's
    surviving documents (the rows a downstream pipeline keeps) and the
    (new_id, ref_id, jaccard) rows that got them rejected (quarantine /
    metrics) — reference rejections, plus intra-batch rejections when
    ``screen_within_batch`` is on.  Both are materialized BEFORE the
    reference commit, so the sink sees exactly what was ingested.  The
    reference at ``reference_uri`` must already exist
    (``MinHashReference.build`` the seed corpus first); the stream's
    columns must include the artifact's ``id_col`` and ``text_col``.
    
    ``session``: an externally-held :class:`~tiledb_vector_search_spark.
    storage.LeaseHandle` (from ``writer_lease`` around the stream) —
    batches then RENEW the one session lease instead of claiming and
    releasing per micro-batch (~0.2 s/batch measured), and a takeover
    mid-stream still fails the next batch loudly before it writes.
    """
    if not stream.isStreaming:
        raise ValueError("stream_crawl_loop needs a streaming DataFrame")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tiledb_vector_search_spark.operators.dedup import (
            MinHashReference,
            connected_components,
            minhash_dedup,
        )

        ref = MinHashReference(batch_df.sparkSession, reference_uri)
        if session is not None:
            adopt_writer_session(ref, session)
        id_col = ref.meta["id_col"]
        key = f"{stream_id}:{batch_id}"
        replay = key in ref.meta.get("applied_keys", [])
        intra_matches = None
        if screen_within_batch:
            # collapse intra-batch near-dup groups to their canonical
            # (min-id) member BEFORE the reference screen, with the
            # artifact's own signing family so "near-dup" means the
            # same thing on both screens; cost ∝ batch, never corpus.
            # Runs on REPLAY too: the screen is deterministic, so a
            # redelivered batch reproduces the original intra_matches
            # (an intra-dropped doc's removal record must not vanish
            # when a sink overwrites by batch id) and the accepted-set
            # reconstruction below semi-joins the same canonical slice
            intra_pairs = minhash_dedup(
                batch_df,
                text_col=ref.meta["text_col"],
                id_col=id_col,
                num_perm=ref.meta["num_perm"],
                bands=ref.meta["bands"],
                threshold=threshold,
                shingle_n=ref.meta["shingle_n"],
            )
            comp = connected_components(intra_pairs, "id_a", "id_b")
            dropped = comp.where("doc_id != canonical_id").select(
                F.col("doc_id").alias(id_col)
            )
            batch_df = batch_df.join(
                F.broadcast(dropped), id_col, "left_anti"
            ).localCheckpoint(eager=True)
            # report EVERY dropped doc: orient each verified pair both
            # ways and keep the rows whose new_id was dropped.  Deriving
            # this from the raw (id_a < id_b) orientation misses docs —
            # jaccard is not transitive, so a dropped doc can appear
            # only as id_a in its verified pairs (e.g. pairs (5,9) and
            # (3,9) with canonical 3: doc 5 is dropped but is never an
            # id_b).  A dropped doc always sits in ≥1 verified pair (the
            # components are built from them), so the semi-join keeps
            # ≥1 matches row per dropped doc; canonicals never appear
            # as new_id (ref_id may itself be dropped further down a
            # chain — it's a metrics stream)
            sym = intra_pairs.select(
                F.col("id_a").alias("new_id"),
                F.col("id_b").alias("ref_id"),
                "jaccard",
            ).unionByName(
                intra_pairs.select(
                    F.col("id_b").alias("new_id"),
                    F.col("id_a").alias("ref_id"),
                    "jaccard",
                )
            )
            intra_matches = sym.join(
                F.broadcast(dropped.select(F.col(id_col).alias("new_id"))),
                "new_id",
                "left_semi",
            )
        # r11 opt: ONE shingle/tokenize pass AND one signature/band pass
        # serve both the screen (match) and the ingest (add_documents) —
        # previously the accepted docs' text was re-tokenized AND
        # re-signed per batch.  Computed AFTER the intra-batch screen so
        # the frames are exactly batch_df's (match's contract).
        from pyspark import StorageLevel
        from tiledb_vector_search_spark.operators.dedup import (
            _affine_minhash_signatures,
            _band_keys,
            _shingle_docs,
        )

        sh_all = _shingle_docs(
            batch_df, ref.meta["text_col"], id_col, ref.meta["shingle_n"]
        ).persist(StorageLevel.MEMORY_AND_DISK)
        bands_all = _band_keys(
            _affine_minhash_signatures(
                sh_all, id_col, ref.meta["num_perm"]
            ),
            id_col, ref.meta["num_perm"], ref.meta["bands"],
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # a doc is never a duplicate of ITSELF: the self-pair only
        # arises when a replayed batch screens against its own already-
        # committed copies (same id), and excluding it is semantically
        # right in every case
        matches = ref.match(
            batch_df,
            threshold=threshold,
            precomputed_shingles=sh_all,
            precomputed_bands=bands_all,
        ).where(F.col("new_id") != F.col("ref_id"))
        if intra_matches is not None:
            matches = matches.unionByName(intra_matches)
        # one evaluation feeds the reject filter AND the sink: the
        # match is deterministic, but double-running it doubles the
        # batch's sign/band cost for nothing
        matches = matches.localCheckpoint(eager=True)
        if replay:
            # REPLAY of a committed batch (crash between the reference
            # commit and the checkpoint ack): the accepted set is
            # reconstructed EXACTLY from the commit's own ids record —
            # an increment-sized read, never a corpus-sized job.
            # `matches` re-screens against the moved reference, so
            # pairs among THIS batch's accepted near-copies may appear
            # that the original run didn't emit — a bounded,
            # idempotent-to-absorb superset.
            ids = ref.accepted_ids_for_key(key)
            if ids is not None:
                # increment-sized record: broadcasting it is safe
                accepted = batch_df.join(
                    F.broadcast(ids.select(id_col)), id_col, "left_semi"
                ).localCheckpoint(eager=True)
            else:
                # pre-record artifact (key committed by an older build):
                # fall back to the corpus-sized shingle semi-join — NO
                # broadcast hint (a forced hint AQE cannot demote would
                # OOM the driver on exactly this corpus-sized side);
                # AQE picks the join strategy
                ids = batch_df.sparkSession.read.parquet(
                    *ref._dirs("shingles")
                ).select(id_col)
                accepted = batch_df.join(
                    ids, id_col, "left_semi"
                ).localCheckpoint(eager=True)
        else:
            dup_ids = matches.select(
                F.col("new_id").alias(id_col)
            ).distinct()
            accepted = batch_df.join(
                F.broadcast(dup_ids), id_col, "left_anti"
            ).localCheckpoint(eager=True)
            if not accepted.isEmpty():
                ref.add_documents(
                    accepted,
                    idempotency_key=key,
                    precomputed_shingles=sh_all,
                    precomputed_bands=bands_all,
                )
                if (
                    consolidate_every is not None
                    and ref.batch_debt >= consolidate_every
                ):
                    ref.consolidate()
        bands_all.unpersist()
        sh_all.unpersist()
        sink(accepted, matches, batch_id)

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_kw:
        writer = writer.trigger(**trigger_kw)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
