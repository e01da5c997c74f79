"""Streaming embedding-similarity screen against a vector index — the
SEMANTIC twin of the lexical crawl loop.

Completes the streaming family's symmetry: the lexical side has
``dedup_against`` (screen) and ``crawl_loop`` (screen → accept → grow);
the vector side had only ``updates`` (grow) and ``search`` (query).
This operator screens each candidate micro-batch against a built ANN
index ("drop anything whose embedding near-duplicates what the corpus
already holds" — the SemDeDup/embedding-cosine dedup family, applied at
the crawl boundary), and with ``add_survivors=True`` folds the accepted
vectors back through the index's own updates log, so the next batch
screens against a corpus that already contains this batch's accepts.

Snapshot discipline (the family contract): the index is RE-OPENED per
micro-batch through its meta pointer — concurrent DML or consolidation
lands at the next batch boundary, never mid-batch.

Replay determinism WITHOUT an ids record: the batch's OWN ids are
excluded from the index search itself (``Index.query(excluded_ids=...)``
— an anti-join BEFORE top-k, so a batch-mate can never even occupy a
candidate slot: a doc is never a duplicate of itself, and batch-mates
couldn't have rejected each other on the original delivery — the index
didn't hold them yet).  Because ``merge_batch`` upserts are
latest-wins on id, a re-delivered batch re-writes identical rows, and
the screen — a deterministic function of (batch, index state
restricted to NON-batch ids) — reproduces the original accept set
exactly.  The pushdown matters on the crash-replay path specifically:
with ``add_survivors=True`` a driver that crashed after ``merge_batch``
but before the streaming checkpoint committed re-delivers the batch to
an index that now CONTAINS the accepted batch-mates; were they merely
filtered AFTER a top-k, they could push a true corpus duplicate below
k and flip a rejection into an acceptance on replay.  Candidate ids must therefore be FRESH
(never collide with pre-existing index ids): an upsert onto an existing
id would overwrite the vector the replay screens against.  This is the
standard crawl contract (new crawl = new ids); ``check_fresh_ids=True``
asserts it per batch with a corpus-scan probe — an integration-time
check, OFF by default because the probe costs one base-id scan per
batch (the screen itself stays ∝ increment).

Within-batch duplicates: by default two near-copies arriving in the
same micro-batch both survive (the index can't see either until the
batch commits).  ``screen_within_batch=True`` closes this the way the
lexical crawl loop does: the batch first collapses to one CANONICAL
(min-id) survivor per intra-batch near-dup group — pairs from a
``knn_join`` self-join in the INDEX's own metric at the same
threshold, transitive closure via ``connected_components`` — and only
canonicals face the index screen.  The intra rejections are reported
in ``matches`` alongside index rejections (oriented new_id = dropped
doc).  The self-join routes through batch-trained IVF cells (cost ∝
batch · nprobe, never batch²); routing is deterministic (hash-ordered
centroid sample), so replay still reproduces the accept set exactly —
but routing is approximate: an intra pair split across non-probed
cells can slip through (raise ``within_batch_nprobe`` to trade cost
for completeness).  ``k`` is the fetch depth per candidate against the
index: batch ids are excluded BEFORE the top-k selection, so all k
slots hold genuine non-batch corpus neighbors even on
heavy-self-duplication streams.

Scale posture: per batch = ONE index query (cost ∝ batch × probed
partitions — the same plan the batch query path runs), one broadcast
anti-join on the bounded duplicate-id set, and an increment-sized
updates append.  The index updates log auto-compacts; full
consolidation stays an explicit operator call, off the screening path.

Reference status: the reference has no streaming engine and no crawl
screen (SURVEY §2.12); this is LLM-pipeline extension surface composing
``Index.query`` + ``Index.merge_batch``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tiledb_vector_search_spark.storage import adopt_writer_session

from tiledb_vector_search_spark.schemas import (
    ID_COL,
    QUERY_ID_COL,
    VECTOR_COL,
    integral_id_col,
)


def embedding_screen_batch(
    idx: Any,
    batch_df: DataFrame,
    threshold: float,
    k: int = 4,
    id_col: str = ID_COL,
    vector_col: str = VECTOR_COL,
    query_kwargs: dict[str, Any] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One batch of the screen as a plain (accepted, matches) call — the
    vector-side analogue of ``MinHashReference.match`` + anti-join, and
    the exact per-batch plan ``stream_embedding_screen`` runs (the
    stream delegates here; the scaling harness times this directly).

    ``matches`` rows are (new_id, ref_id, distance) for every rejecting
    non-batch neighbor; ``accepted`` keeps all input columns.  Both are
    ``localCheckpoint``-ed: one evaluation feeds the reject filter and
    the caller.
    """
    qkw = dict(query_kwargs or {})
    ids = batch_df.select(
        integral_id_col(
            batch_df, id_col, "embedding_screen_batch"
        ).alias(ID_COL)
    ).localCheckpoint(eager=True)
    q = batch_df.select(
        F.col(id_col).cast("long").alias(QUERY_ID_COL),
        F.col(vector_col).cast("array<float>").alias(VECTOR_COL),
    )
    # batch-mates never reject each other (self-pairs included): the
    # excluded_ids PUSHDOWN removes them before the index's top-k, so
    # every returned neighbor is a genuine non-batch corpus row — the
    # decision is a pure function of the NON-batch index state even
    # when a crash-replayed batch queries an index that already holds
    # its accepted batch-mates (see module docstring)
    res = idx.query(q, k, excluded_ids=ids, **qkw).where(
        F.col("distance").isNotNull()
    )
    dup = (
        res.where(
            F.col("distance") <= threshold
            if idx.metric.ascending
            else F.col("distance") >= threshold
        )
        .select(
            F.col(QUERY_ID_COL).alias("new_id"),
            F.col("external_id").alias("ref_id"),
            "distance",
        )
    )
    matches = dup.localCheckpoint(eager=True)
    dup_ids = matches.select(F.col("new_id").alias(id_col)).distinct()
    accepted = batch_df.join(
        F.broadcast(dup_ids), id_col, "left_anti"
    ).localCheckpoint(eager=True)
    return accepted, matches


def _collapse_within_batch(
    idx: Any,
    batch_df: DataFrame,
    threshold: float,
    id_col: str,
    vector_col: str,
    nprobe: int,
) -> tuple[DataFrame, DataFrame]:
    """(canonical-only batch, intra matches): one min-id survivor per
    intra-batch near-dup group, in the index's own metric + threshold.

    ``knn_join`` self-join (batch-trained deterministic IVF routing,
    cost ∝ batch · nprobe) → threshold filter → transitive closure →
    drop non-canonicals.  Matches derive from BOTH pair orientations
    filtered to dropped ids — the raw (a, b) orientation misses docs
    whose only verified pairs have them on the left (the lexical crawl
    loop's wave-1 lesson)."""
    from tiledb_vector_search_spark.operators.dedup import (
        connected_components,
    )
    from tiledb_vector_search_spark.operators.knn import knn_join

    vecs = batch_df.select(
        integral_id_col(
            batch_df, id_col, "stream_embedding_screen within-batch"
        ).alias("__wid"),
        F.col(vector_col).cast("array<float>").alias("__wvec"),
    ).localCheckpoint(eager=True)
    kj = knn_join(
        vecs.select(F.col("__wid").alias(QUERY_ID_COL), F.col("__wvec").alias(VECTOR_COL)),
        vecs.select(F.col("__wid").alias(ID_COL), F.col("__wvec").alias(VECTOR_COL)),
        k=4,
        nprobe=nprobe,
        metric=idx.metric,
    )
    cond = (
        F.col("distance") <= threshold
        if idx.metric.ascending
        else F.col("distance") >= threshold
    )
    pairs = (
        kj.where(cond & (F.col(QUERY_ID_COL) != F.col(ID_COL)))
        .select(
            F.col(QUERY_ID_COL).alias("id_a"),
            F.col(ID_COL).alias("id_b"),
            "distance",
        )
        .localCheckpoint(eager=True)
    )
    comp = connected_components(pairs, "id_a", "id_b")
    dropped = comp.where("doc_id != canonical_id").select(
        F.col("doc_id").alias("__wid")
    )
    kept = batch_df.join(
        F.broadcast(dropped.select(F.col("__wid").alias(id_col))),
        id_col,
        "left_anti",
    ).localCheckpoint(eager=True)
    sym = pairs.select(
        F.col("id_a").alias("new_id"), F.col("id_b").alias("ref_id"), "distance"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("new_id"), F.col("id_a").alias("ref_id"), "distance"
        )
    )
    intra = sym.join(
        F.broadcast(dropped.select(F.col("__wid").alias("new_id"))),
        "new_id",
        "left_semi",
    ).localCheckpoint(eager=True)
    return kept, intra


def stream_embedding_screen(
    stream: DataFrame,
    index_uri: str,
    sink: Any,
    threshold: float,
    k: int = 4,
    id_col: str = ID_COL,
    vector_col: str = VECTOR_COL,
    add_survivors: bool = False,
    check_fresh_ids: bool = False,
    screen_within_batch: bool = False,
    within_batch_nprobe: int = 4,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    query_kwargs: dict[str, Any] | None = None,
    session: Any = None,
    **trigger_kw: Any,
) -> StreamingQuery:
    """``foreachBatch`` embedding screen (and optional grow) per batch.

    ``sink(accepted_df, matches_df, batch_id)`` receives the batch's
    surviving rows (all input columns) and the (new_id, ref_id,
    distance) rows that got candidates rejected.  ``threshold`` is in
    the INDEX's score domain: for ascending metrics (l2 / sum_of_squares
    / cosine-distance) a candidate is a duplicate when some non-batch
    neighbor has ``distance <= threshold``; for inner_product (larger =
    better) when ``distance >= threshold``.  ``query_kwargs`` forwards
    nprobe / k_factor / recall_target / strategy to ``Index.query``.

    SINGLE-WRITER when ``add_survivors=True`` — one screen loop per
    index (the updates log has no idempotency ledger; exactly-once
    rests on latest-wins upserts of fresh ids, see module docstring).
    
    ``session``: an externally-held :class:`~tiledb_vector_search_spark.
    storage.LeaseHandle` (from ``writer_lease`` around the stream) —
    batches then RENEW the one session lease instead of claiming and
    releasing per micro-batch (~0.2 s/batch measured), and a takeover
    mid-stream still fails the next batch loudly before it writes.
    """
    if not stream.isStreaming:
        raise ValueError("stream_embedding_screen needs a streaming DataFrame")
    qkw = dict(query_kwargs or {})

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tiledb_vector_search_spark.indexes import open_index

        idx = open_index(batch_df.sparkSession, index_uri)
        if session is not None:
            adopt_writer_session(idx, session)
        if check_fresh_ids:
            ids = batch_df.select(
                integral_id_col(
                    batch_df, id_col, "stream_embedding_screen"
                ).alias("__batch_id")
            )
            stale = (
                idx.effective_vectors()
                .select(F.col(ID_COL).alias("__batch_id"))
                .join(F.broadcast(ids), "__batch_id", "left_semi")
                .limit(1)
                .count()
            )
            if stale:
                raise ValueError(
                    "stream_embedding_screen: a candidate id already "
                    "exists in the index — candidate ids must be fresh "
                    "(an upsert onto a live id would overwrite the "
                    "vector replays screen against).  Remap crawl ids "
                    "upstream, or pass check_fresh_ids=False if the "
                    "collision is intentional."
                )
        intra = None
        if screen_within_batch:
            batch_df, intra = _collapse_within_batch(
                idx, batch_df, threshold, id_col, vector_col,
                within_batch_nprobe,
            )
        accepted, matches = embedding_screen_batch(
            idx, batch_df, threshold, k=k,
            id_col=id_col, vector_col=vector_col, query_kwargs=qkw,
        )
        if intra is not None:
            matches = matches.unionByName(intra)
        if add_survivors and not accepted.isEmpty():
            idx.merge_batch(
                accepted.select(
                    F.col(id_col).cast("long").alias(ID_COL),
                    F.col(vector_col).cast("array<float>").alias(VECTOR_COL),
                    F.lit(False).alias("is_delete"),
                )
            )
        sink(accepted, matches, batch_id)

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_kw:
        writer = writer.trigger(**trigger_kw)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
