"""FlatIndex lifecycle: ingest, query, update/delete, consolidate, time travel.

Scenario structure mirrors the reference's e2e tests
(``apis/python/test/test_ingestion.py:596-1340`` update/timetravel cases),
with exact-equality gates — FLAT is deterministic.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes import FlatIndex, open_index
from tiledb_vector_search_spark.indexes.base import Index

from tests.conftest import numpy_topk

K = 5
NQ = 4


@pytest.fixture()
def source(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )


@pytest.fixture()
def queries(source):
    return source.where(f"external_id < {NQ}").select(
        F.col("external_id").alias("query_id"), "vector"
    )


def test_ingest_query_exact(spark, tmp_path, source, queries, embeddings_np):
    ids, mat = embeddings_np
    idx = FlatIndex.ingest(spark, str(tmp_path / "flat"), source, timestamp=1000)
    res = idx.query(queries, K).orderBy("query_id", "rank").collect()
    oracle = numpy_topk(mat[: NQ], ids, mat, K)
    assert len(res) == NQ * K
    for r in res:
        oid, od = oracle[r.query_id][r.rank - 1]
        assert r.external_id == oid
        assert r.distance == pytest.approx(od, rel=1e-9, abs=1e-12)


def test_open_dispatch(spark, tmp_path, source):
    uri = str(tmp_path / "flat")
    FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx = open_index(spark, uri)
    assert isinstance(idx, FlatIndex)
    assert idx.dimensions == 64
    assert idx.metric.value == "sum_of_squares"


def test_update_delete_overlay(spark, tmp_path, source, queries, embeddings_np):
    ids, mat = embeddings_np
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)

    # delete the self-match of query 0; update vector 1 to equal query 2
    idx.delete(0, timestamp=2000)
    idx.update(1, [float(v) for v in mat[2]], timestamp=3000)
    idx = open_index(spark, uri)

    res = idx.query(queries, K).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    got0 = {r.external_id for r in by_q[0]}
    assert 0 not in got0  # deleted
    # query 2 now has two exact matches: itself and updated id 1
    top2 = sorted(by_q[2], key=lambda r: r.rank)[:2]
    assert {r.external_id for r in top2} == {1, 2}
    assert all(r.distance == pytest.approx(0.0, abs=1e-12) for r in top2)

    # effective size: one delete, update replaces existing id
    assert idx.size() == len(ids) - 1


def test_latest_update_wins(spark, tmp_path, source, embeddings_np):
    ids, mat = embeddings_np
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx.update(7, [float(v) for v in mat[3]], timestamp=2000)
    idx.delete(7, timestamp=3000)
    idx = open_index(spark, uri)
    assert idx.size() == len(ids) - 1
    # then re-add
    idx.update(7, [float(v) for v in mat[3]], timestamp=4000)
    idx = open_index(spark, uri)
    assert idx.size() == len(ids)


def test_merge_batch_same_ts_upsert_beats_tombstone(
    spark, tmp_path, source, embeddings_np
):
    """A single merge_batch micro-batch stamps all rows with ONE ts, so an
    upsert and a tombstone for the same id tie on ts.  The conflict must
    resolve deterministically with the upsert winning — the same outcome as
    issuing the delete first and the upsert at a later ts (ADVICE r3)."""
    from tiledb_vector_search_spark.session import small_df

    ids, mat = embeddings_np
    uri = str(tmp_path / "flatmerge")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    n0 = idx.size()

    vec = [float(v) for v in mat[3]]
    batch = small_df(
        spark,
        [
            (7, vec, True),  # tombstone id 7 ...
            (7, vec, False),  # ... and upsert it in the SAME batch
            (9, None, True),  # plain tombstone
        ],
        "external_id long, vector array<float>, is_delete boolean",
    )
    idx.merge_batch(batch, timestamp=2000)
    # determinism: ten reads of the overlay all resolve the same way
    for _ in range(10):
        idx = open_index(spark, uri)
        assert idx.size() == n0 - 1  # id 9 gone; id 7 upserted, not deleted
        latest = idx._latest_updates().where("external_id = 7").collect()
        assert len(latest) == 1 and latest[0]["is_delete"] is False


def test_time_travel(spark, tmp_path, source, queries, embeddings_np):
    ids, mat = embeddings_np
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx.delete(0, timestamp=2000)

    # open as of before the delete: vector 0 still present
    as_of = open_index(spark, uri, timestamp=1500)
    res0 = [r for r in as_of.query(queries, K).collect() if r.query_id == 0]
    assert any(r.external_id == 0 for r in res0)
    # and at latest, gone
    now = open_index(spark, uri)
    res0 = [r for r in now.query(queries, K).collect() if r.query_id == 0]
    assert not any(r.external_id == 0 for r in res0)


def test_consolidate_updates(spark, tmp_path, source, queries, embeddings_np):
    ids, mat = embeddings_np
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx.delete(0, timestamp=2000)
    idx.update(1, [float(v) for v in mat[2]], timestamp=2500)
    before = {
        (r.query_id, r.rank): r.external_id
        for r in open_index(spark, uri).query(queries, K).collect()
    }
    idx2 = open_index(spark, uri).consolidate_updates(timestamp=5000)
    assert idx2.base_ts == 5000
    assert not idx2._has_updates()
    after = {
        (r.query_id, r.rank): r.external_id
        for r in idx2.query(queries, K).collect()
    }
    assert before == after
    # pre-consolidation snapshot still time-travelable
    old = open_index(spark, uri, timestamp=1200)
    assert old.base_ts == 1000
    assert any(
        r.external_id == 0 for r in old.query(queries, K).collect() if r.query_id == 0
    )


def test_time_travel_between_base_and_fold_survives_consolidation(
    spark, tmp_path, source, queries, embeddings_np
):
    """r11 parity fix: consolidation must NOT destroy the updates log.
    A time-traveled open BETWEEN the old base and the fold reads the
    old base + the update batches in its window; the reference keeps
    that history until vacuum (index.py:579-735).  Before the fix,
    consolidate_updates cleared the folded batches and open(t=1600)
    silently regressed to the pre-update corpus."""
    ids, mat = embeddings_np
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx.delete(0, timestamp=1500)
    want = {
        (r.query_id, r.rank): r.external_id
        for r in open_index(spark, uri, timestamp=1600).query(
            queries, K
        ).collect()
    }
    idx2 = open_index(spark, uri).consolidate_updates(timestamp=2000)
    # the same time-traveled open reads identically after the fold
    got = {
        (r.query_id, r.rank): r.external_id
        for r in open_index(spark, uri, timestamp=1600).query(
            queries, K
        ).collect()
    }
    assert got == want
    # the folded batch is retained in the log but OUT of the latest
    # window (<= new base ts)
    assert open_index(spark, uri).storage.read_meta()["update_batches"] == [
        1500
    ]
    assert not idx2._has_updates()
    # vacuum is where history dies: the old base goes, and with it the
    # now-unreachable batch
    idx2.vacuum()
    meta = open_index(spark, uri).storage.read_meta()
    assert meta["update_batches"] == []
    with pytest.raises(ValueError):
        open_index(spark, uri, timestamp=1600)  # vacuumed away


def test_vacuum_and_delete(spark, tmp_path, source):
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx.update(1, [0.0] * 64, timestamp=2000)
    idx2 = open_index(spark, uri).consolidate_updates(timestamp=3000)
    dropped = idx2.vacuum()
    assert dropped == [1000]
    with pytest.raises(ValueError):
        open_index(spark, uri, timestamp=1500)  # vacuumed away
    Index.delete_index(spark, uri)
    with pytest.raises(FileNotFoundError):
        open_index(spark, uri)


def test_clear_history_drops_bases_and_batches_before_ts(
    spark, tmp_path, source, queries
):
    """clear_history(t): bases ≤ t vacuumed, folded batches ≤ t reclaimed,
    everything after t (including post-fold batches) intact (reference
    ``index.py:626-735``)."""
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx.delete(0, timestamp=1500)
    idx2 = open_index(spark, uri).consolidate_updates(timestamp=2000)
    idx2.delete(1, timestamp=2500)
    open_index(spark, uri).clear_history(1700)
    meta = open_index(spark, uri).storage.read_meta()
    assert [e["ts"] for e in meta["ingestions"]] == [2000]
    # the folded 1500 batch died with its base; the reachable 2500 lives
    assert meta["update_batches"] == [2500]
    with pytest.raises(ValueError):
        open_index(spark, uri, timestamp=1600)  # history cleared
    got = {
        r.external_id
        for r in open_index(spark, uri).query(queries, K).collect()
    }
    assert 0 not in got and 1 not in got  # both deletes still in force


def test_clear_history_at_or_after_newest_base_keeps_reachable_updates(
    spark, tmp_path, source, queries
):
    """Clamp edge: clear_history(t) with t ≥ the newest base must NOT
    delete update batches still reachable from the kept snapshot — an
    unclamped clear stranded the base without its updates (latest reads
    silently regressed).  Deliberate divergence from the reference's
    reset-to-empty-sentinel: latest reads stay byte-identical and
    delete_index is the destroy verb (see Index.clear_history)."""
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx.delete(0, timestamp=1500)
    open_index(spark, uri).clear_history(9999)
    meta = open_index(spark, uri).storage.read_meta()
    assert [e["ts"] for e in meta["ingestions"]] == [1000]
    assert meta["update_batches"] == [1500]  # reachable: survives
    got = {
        r.external_id
        for r in open_index(spark, uri).query(queries, K).collect()
    }
    assert 0 not in got  # the delete is still in force at latest


def test_clear_history_reclaims_stray_batches_below_every_base(
    spark, tmp_path, source
):
    """A batch written with an explicit timestamp below every base sits in
    no read window (windows are (base, t]); clear_history is its only
    collector — vacuum never drops a snapshot here, so the trailing
    clamped clear must reclaim it."""
    uri = str(tmp_path / "flat")
    idx = FlatIndex.ingest(spark, uri, source, timestamp=1000)
    idx.update(1, [0.0] * 64, timestamp=500)  # stray: below the base
    open_index(spark, uri).clear_history(700)
    meta = open_index(spark, uri).storage.read_meta()
    assert [e["ts"] for e in meta["ingestions"]] == [1000]
    assert meta["update_batches"] == []


def test_query_np_reference_contract(spark, tmp_path, source, embeddings_np):
    """query_np: numpy in, (distances, ids) out — row q holds query q's
    top-k ascending; slots past the result count carry the reference's
    MAX_FLOAT32/MAX_UINT64 sentinels (index.py:244-416)."""
    ids, mat = embeddings_np
    idx = FlatIndex.ingest(spark, str(tmp_path / "flat"), source, timestamp=1000)
    d, got_ids = idx.query_np(mat[:NQ], K)
    assert d.shape == (NQ, K) and got_ids.shape == (NQ, K)
    assert d.dtype == np.float32 and got_ids.dtype == np.uint64
    oracle = numpy_topk(mat[:NQ], ids, mat, K)
    for q in range(NQ):
        assert [int(x) for x in got_ids[q]] == [o[0] for o in oracle[q]]
        np.testing.assert_allclose(
            d[q], [o[1] for o in oracle[q]], rtol=1e-6, atol=1e-6
        )
    # sentinel padding: an updates-only window with ONE vector fills
    # slots 2..k with MAX sentinels
    idx.update(900_001, [0.5] * 64, timestamp=2000)
    ranged = open_index(spark, idx.uri, timestamp=(1500, None))
    d2, ids2 = ranged.query_np(mat[0], K)
    assert ids2.shape == (1, K)
    assert int(ids2[0, 0]) == 900_001
    assert (ids2[0, 1:] == np.iinfo(np.uint64).max).all()
    assert (d2[0, 1:] == np.finfo(np.float32).max).all()


def test_query_validation(spark, tmp_path, source):
    idx = FlatIndex.ingest(spark, str(tmp_path / "flat"), source, timestamp=1000)
    bad = source.limit(1)  # wrong columns
    with pytest.raises(ValueError, match="query_id"):
        idx.query(bad, 3)


def test_allowed_ids_pushdown_exact(spark, tmp_path, sf_dir, embeddings_np):
    """FLAT + allowed_ids == numpy brute force over the allowed subset
    (both kernel and expr strategies)."""
    from pyspark.sql import functions as F

    from tests.conftest import numpy_topk

    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )
    idx = FlatIndex.ingest(spark, str(tmp_path / "flat_allowed"), src, timestamp=1)
    ids, mat = embeddings_np
    allowed_mask = ids % 5 == 1
    a_ids, a_mat = ids[allowed_mask], mat[allowed_mask]
    allowed_df = spark.createDataFrame(
        [(int(i),) for i in a_ids], "external_id long"
    )
    queries = src.where("external_id < 5").select(
        F.col("external_id").alias("query_id"), "vector"
    )
    oracle = numpy_topk(mat[:5], a_ids, a_mat, 4)
    for strategy in ("kernel", "expr"):
        res = idx.query(
            queries, 4, strategy=strategy, allowed_ids=allowed_df
        ).collect()
        got = {}
        for r in res:
            got.setdefault(r.query_id, []).append((r.rank, r.external_id))
        for qid in range(5):
            want = [i for i, _ in oracle[qid]]
            assert [i for _, i in sorted(got[qid])] == want
