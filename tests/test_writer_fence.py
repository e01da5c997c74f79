"""Writer fence on the persisted artifacts (BM25Index, MinHashReference).

Both artifacts commit mutations through a read-modify-write of the meta
pointer, so they are SINGLE-WRITER by contract.  Before the fence the
contract was documented but unenforced: a zombie writer (a stale handle
whose meta predates another writer's commits — exactly the crashed-and-
restarted-stream scenario the idempotency ledger exists for) would mint
the same batch id and its later meta flip silently dropped the other
writer's committed batch.  The fence (``storage.fenced_meta_flip``)
turns that silent loss into ``ConcurrentWriterError`` on the losing
side: a pre-flip version check plus a post-flip nonce verification.

The first tests in each pair PROVE the hazard at the storage level (a
raw stale overwrite — the pre-fence code path — drops a committed
batch); the rest prove the fenced API raises instead and the surviving
state is exactly the winner's commit.
"""

from __future__ import annotations

import json
import posixpath

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.operators.dedup import MinHashReference
from tiledb_vector_search_spark.operators.retrieval import (
    BM25_META_FILE,
    BM25Index,
)
from tiledb_vector_search_spark.storage import (
    ConcurrentWriterError,
    HadoopFS,
    fenced_meta_flip,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _slice(docs, lo, hi):
    return docs.where(f"doc_id >= {lo} AND doc_id < {hi}")


def _ordinals(meta, key="batches"):
    """Batch entries are "<ordinal>-<nonce>" strings (ints pre-fence)."""
    return [int(str(e).split("-")[0]) for e in meta.get(key, [])]


# -- the hazard, demonstrated at the storage level (pre-fence behavior) --


def test_unfenced_stale_overwrite_drops_committed_batch(spark, docs, tmp_path):
    """What the pre-fence code did: writer B flips its STALE meta over
    writer A's commit — A's batch vanishes from the committed list with
    no error anywhere.  This is the data loss the fence exists to stop."""
    uri = str(tmp_path / "bm25")
    BM25Index.build(spark, uri, _slice(docs, 0, 40))
    a = BM25Index(spark, uri)
    b = BM25Index(spark, uri)  # same version as a: the zombie-to-be
    stale = dict(b.meta)
    a.add_documents(_slice(docs, 40, 60))
    assert _ordinals(BM25Index(spark, uri).meta) == [1]
    # the old unfenced flip: write the stale meta verbatim
    HadoopFS(spark, uri).write_text_atomic(
        posixpath.join(uri, BM25_META_FILE), json.dumps(stale)
    )
    # A's committed batch is gone — silently (this assertion IS the bug)
    assert _ordinals(BM25Index(spark, uri).meta) == []


# -- the fence: the losing writer RAISES, the winner's commit survives --


def test_bm25_zombie_add_raises_and_winner_survives(spark, docs, tmp_path):
    uri = str(tmp_path / "bm25")
    BM25Index.build(spark, uri, _slice(docs, 0, 40))
    a = BM25Index(spark, uri)
    b = BM25Index(spark, uri)
    a.add_documents(_slice(docs, 40, 60))
    n_after_a = a.n_docs
    with pytest.raises(ConcurrentWriterError):
        b.add_documents(_slice(docs, 60, 80))
    # surviving state is exactly A's commit: batch list, stats, queries
    survivor = BM25Index(spark, uri)
    assert _ordinals(survivor.meta) == [1]
    assert survivor.n_docs == n_after_a
    # B's staged dirs are invisible orphans: a fresh handle can still
    # mutate, and the orphan batch id is simply reused/overwritten
    survivor.add_documents(_slice(docs, 60, 80))
    assert _ordinals(BM25Index(spark, uri).meta) == [1, 2]


def test_bm25_zombie_remove_and_consolidate_raise(spark, docs, tmp_path):
    uri = str(tmp_path / "bm25")
    idx = BM25Index.build(spark, uri, _slice(docs, 0, 40))
    idx.add_documents(_slice(docs, 40, 60))
    b = BM25Index(spark, uri)  # sees batch 1 — stale debt once A moves on
    a = BM25Index(spark, uri)
    a.add_documents(_slice(docs, 60, 80))
    ids = _slice(docs, 0, 5).select("doc_id")
    with pytest.raises(ConcurrentWriterError):
        b.remove_documents(ids)
    with pytest.raises(ConcurrentWriterError):
        b.consolidate()  # b's view has debt, so it reaches the flip
    # the stale handle's failures left the winner's state untouched
    assert _ordinals(BM25Index(spark, uri).meta) == [1, 2]


def test_bm25_single_writer_lifecycle_unchanged(spark, docs, tmp_path):
    """The fence is invisible to the contract-compliant caller: one
    handle sequences add → remove → consolidate → add, and a reopened
    handle continues from there."""
    uri = str(tmp_path / "bm25")
    idx = BM25Index.build(spark, uri, _slice(docs, 0, 40))
    idx.add_documents(_slice(docs, 40, 60))
    idx.remove_documents(_slice(docs, 0, 5).select("doc_id"))
    idx.consolidate()
    idx.add_documents(_slice(docs, 60, 80))
    reopened = BM25Index(spark, uri)
    assert _ordinals(reopened.meta) == [1]
    assert int(reopened.meta["meta_version"]) == 4
    reopened.consolidate()  # fresh handle: version is current, succeeds
    assert BM25Index(spark, uri).meta["generation"] == 2


def test_minhash_zombie_add_raises_and_winner_survives(spark, docs, tmp_path):
    uri = str(tmp_path / "ref")
    seed = MinHashReference.build(spark, uri, _slice(docs, 0, 40))
    seed.add_documents(_slice(docs, 40, 50))
    b = MinHashReference(spark, uri)  # sees batch 1 — about to go stale
    a = MinHashReference(spark, uri)
    a.add_documents(_slice(docs, 50, 60))
    with pytest.raises(ConcurrentWriterError):
        b.add_documents(_slice(docs, 60, 80))
    survivor = MinHashReference(spark, uri)
    assert _ordinals(survivor.meta) == [1, 2]
    with pytest.raises(ConcurrentWriterError):
        b.consolidate()  # b's view has debt, so it reaches the flip
    survivor.consolidate()
    assert MinHashReference(spark, uri).meta["generation"] == 1


def test_minhash_match_still_correct_after_fenced_growth(spark, docs, tmp_path):
    """End-to-end: the surviving state after a fenced-off zombie is a
    working artifact — match() sees exactly the winner's documents."""
    uri = str(tmp_path / "ref")
    MinHashReference.build(spark, uri, _slice(docs, 0, 40))
    a = MinHashReference(spark, uri)
    b = MinHashReference(spark, uri)
    a.add_documents(_slice(docs, 40, 45))
    with pytest.raises(ConcurrentWriterError):
        b.add_documents(_slice(docs, 50, 55))
    near = _slice(docs, 40, 45).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat("text", F.lit(" trailer")).alias("text"),
    )
    hits = {
        r.ref_id
        for r in MinHashReference(spark, uri)
        .match(near, threshold=0.8)
        .collect()
    }
    assert hits == {40, 41, 42, 43, 44}  # winner's increment is live


# -- the post-verify arm, unit-tested with a hostile fs ------------------


class _RacingFS:
    """Duck-typed HadoopFS whose read-after-write returns a FOREIGN
    nonce — the narrow window where a competing rename lands between
    our pre-check and our post-verify."""

    def __init__(self, initial: dict):
        self._content = json.dumps(initial)
        self.writes = 0

    def read_text(self, path: str) -> str:
        return self._content

    def write_text_atomic(self, path: str, content: str) -> None:
        self.writes += 1
        # a competing writer's flip immediately clobbers ours
        clobbered = json.loads(content)
        clobbered["writer_nonce"] = "someone-else"
        self._content = json.dumps(clobbered)


def test_post_verify_detects_lost_race():
    fs = _RacingFS({"meta_version": 3, "batches": [1, 2]})
    with pytest.raises(ConcurrentWriterError, match="DURING this commit"):
        fenced_meta_flip(fs, "/x/meta.json", {"batches": [1, 2, 3]}, 3)
    assert fs.writes == 1


def test_pre_check_names_the_versions():
    fs = _RacingFS({"meta_version": 5})
    with pytest.raises(ConcurrentWriterError, match="version 5.*version 3"):
        fenced_meta_flip(fs, "/x/meta.json", {}, 3)
    assert fs.writes == 0  # refused before touching the file


def test_legacy_int_batch_entries_still_read_and_grow(spark, docs, tmp_path):
    """Pre-fence artifacts list batches as INTS (dirs ``batch=1``); the
    nonce-entry reader must keep resolving them, and the next mutation
    continues the ordinal sequence."""
    uri = str(tmp_path / "bm25")
    idx = BM25Index.build(spark, uri, _slice(docs, 0, 40))
    idx.add_documents(_slice(docs, 40, 60))
    # rewrite the artifact into the PRE-FENCE shape: int batch id,
    # no meta_version/nonce, dir renamed to the bare ordinal
    fs = HadoopFS(spark, uri)
    entry = idx.meta["batches"][0]
    for d in ("postings_batches", "term_stats_batches"):
        fs.rename(
            posixpath.join(uri, d, f"batch={entry}"),
            posixpath.join(uri, d, "batch=1"),
        )
    legacy = {
        k: v
        for k, v in idx.meta.items()
        if k not in ("meta_version", "writer_nonce")
    }
    legacy["batches"] = [1]
    fs.write_text_atomic(
        posixpath.join(uri, BM25_META_FILE), json.dumps(legacy)
    )
    reopened = BM25Index(spark, uri)
    q = _slice(docs, 0, 3).selectExpr(
        "doc_id as query_id", "substring(text, 1, 100) as query_text"
    )
    assert reopened.query(q, k=5).count() > 0  # int entry resolves
    reopened.add_documents(_slice(docs, 60, 80))  # fenced growth works
    assert _ordinals(reopened.meta) == [1, 2]
    assert int(reopened.meta["meta_version"]) == 1  # fence versioning began


def test_vacuum_orphans_reclaims_fenced_loser_dirs(spark, docs, tmp_path):
    """The fence abandons a loser's staged dirs as invisible orphans;
    vacuum_orphans reclaims them without touching anything committed."""
    uri = str(tmp_path / "bm25")
    BM25Index.build(spark, uri, _slice(docs, 0, 40))
    a = BM25Index(spark, uri)
    b = BM25Index(spark, uri)
    a.add_documents(_slice(docs, 40, 60))
    with pytest.raises(ConcurrentWriterError):
        b.add_documents(_slice(docs, 60, 80))
    survivor = BM25Index(spark, uri)
    q = _slice(docs, 0, 3).selectExpr(
        "doc_id as query_id", "substring(text, 1, 100) as query_text"
    )
    before = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in survivor.query(q, k=5).orderBy("query_id", "rank").collect()
    ]
    deleted = survivor.vacuum_orphans()
    assert deleted and all("batch=" in p for p in deleted)
    # committed state untouched: identical scores, zero orphans left
    after = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in BM25Index(spark, uri)
        .query(q, k=5).orderBy("query_id", "rank").collect()
    ]
    assert after == before
    assert BM25Index(spark, uri).vacuum_orphans() == []


def test_minhash_vacuum_orphans_keeps_replay_records(spark, docs, tmp_path):
    uri = str(tmp_path / "ref")
    MinHashReference.build(spark, uri, _slice(docs, 0, 40))
    a = MinHashReference(spark, uri)
    b = MinHashReference(spark, uri)
    a.add_documents(_slice(docs, 40, 60), idempotency_key="s:0")
    with pytest.raises(ConcurrentWriterError):
        b.add_documents(_slice(docs, 60, 80), idempotency_key="zombie:0")
    ref = MinHashReference(spark, uri)
    deleted = ref.vacuum_orphans()
    assert deleted  # the zombie's staged bands/shingles/ids dirs
    # the ledgered key's replay record survives the vacuum
    ids = ref.accepted_ids_for_key("s:0")
    assert ids is not None and ids.count() == 20
    assert ref.vacuum_orphans() == []
