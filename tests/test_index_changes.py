"""index_changes: the CDC streaming source over an index's update log.

Spark 4 Python DataSource (``pyspark.sql.datasource``): offsets are
committed update-batch timestamps, so a checkpointed stream resumes
exactly where it stopped; replay below the log's reclamation floor
(``updates_cleared_through``) fails loudly instead of emitting a
partial window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes import FlatIndex, open_index
from tiledb_vector_search_spark.streaming.index_changes import (
    register_index_changes,
)

V_A = [1.0] * 8
V_B = [2.0] * 8


@pytest.fixture()
def tiny_source(spark):
    rows = [(i, [float(i)] * 8) for i in range(20)]
    return spark.createDataFrame(rows, "external_id long, vector array<float>")


def _drain(spark, uri, ckpt, **opts):
    """Run the source to availableNow; return the collected rows."""
    register_index_changes(spark)
    got: list = []
    reader = spark.readStream.format("index_changes").option("uri", uri)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def test_cdc_emits_committed_batches_and_resumes(spark, tiny_source, tmp_path):
    uri = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    idx = FlatIndex.ingest(spark, uri, tiny_source, timestamp=1000)
    idx.update_batch([(100, V_A), (101, V_B)], timestamp=1500)
    idx.delete(5, timestamp=2000)

    rows = _drain(spark, uri, ckpt)
    got = {(r.external_id, r.is_delete, r.ts) for r in rows}
    assert got == {(100, False, 1500), (101, False, 1500), (5, True, 2000)}
    upsert = next(r for r in rows if r.external_id == 100)
    assert [float(x) for x in upsert.vector] == V_A
    tomb = next(r for r in rows if r.external_id == 5)
    assert tomb.vector is None

    # resume from the checkpoint: only NEW batches are emitted
    idx.update(102, V_A, timestamp=2500)
    rows2 = _drain(spark, uri, ckpt)
    assert {(r.external_id, r.ts) for r in rows2} == {(102, 2500)}

    # nothing new → an empty availableNow run
    assert _drain(spark, uri, ckpt) == []


def test_cdc_start_timestamp_option(spark, tiny_source, tmp_path):
    uri = str(tmp_path / "idx")
    idx = FlatIndex.ingest(spark, uri, tiny_source, timestamp=1000)
    idx.update(100, V_A, timestamp=1500)
    idx.update(101, V_B, timestamp=2000)
    rows = _drain(
        spark, uri, str(tmp_path / "ckpt"), startTimestamp="1500"
    )
    # (start, ...] is exclusive of the given offset — the CDC resume rule
    assert {(r.external_id, r.ts) for r in rows} == {(101, 2000)}


def test_index_mirror_replicates_state_and_history(
    spark, tiny_source, tmp_path
):
    """CDC → merge_batch mirror: after draining, the target answers
    queries identically to the source at LATEST and at every
    time-travel point the mirror passed (timestamp-faithful: events
    re-apply at their source batch ts)."""
    from tiledb_vector_search_spark.streaming.index_changes import (
        stream_index_mirror,
    )

    src_uri = str(tmp_path / "src")
    dst_uri = str(tmp_path / "dst")
    FlatIndex.ingest(spark, src_uri, tiny_source, timestamp=1000)
    FlatIndex.ingest(spark, dst_uri, tiny_source, timestamp=1000)
    src = open_index(spark, src_uri)
    src.update_batch([(100, V_A), (101, V_B)], timestamp=1500)
    src.delete(5, timestamp=2000)
    src.update(100, V_B, timestamp=2500)

    q = stream_index_mirror(
        spark, src_uri, dst_uri, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    queries = tiny_source.where("external_id < 3").select(
        F.col("external_id").alias("query_id"), "vector"
    )
    for ts in (None, 1700, 2200):
        a = {
            (r.query_id, r.rank, r.external_id)
            for r in open_index(spark, src_uri, timestamp=ts)
            .query(queries, 5)
            .collect()
        }
        b = {
            (r.query_id, r.rank, r.external_id)
            for r in open_index(spark, dst_uri, timestamp=ts)
            .query(queries, 5)
            .collect()
        }
        assert a == b, f"diverged at timestamp={ts}"
    # the mirror's log IS the source's log (same batch timestamps)
    assert (
        open_index(spark, dst_uri).storage.read_meta()["update_batches"]
        == open_index(spark, src_uri).storage.read_meta()["update_batches"]
    )
    # incremental: one more source batch, one more drain
    src.delete(101, timestamp=3000)
    q2 = stream_index_mirror(
        spark, src_uri, dst_uri, str(tmp_path / "ckpt")
    )
    q2.awaitTermination()
    got = {
        r.external_id
        for r in open_index(spark, dst_uri).query(queries, 20).collect()
    }
    assert 101 not in got


def test_cdc_fresh_consumer_on_vacuumed_index_starts_at_floor(
    spark, tiny_source, tmp_path
):
    """Default start = earliest RETAINED history (Kafka's
    earliest-available stance): a FRESH consumer on an index whose older
    batches were vacuumed begins at the reclamation floor instead of
    dying on it; an EXPLICIT startTimestamp below the floor still fails
    loudly (it names specific history that is gone)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    uri = str(tmp_path / "idx")
    idx = FlatIndex.ingest(spark, uri, tiny_source, timestamp=1000)
    idx.update(100, V_A, timestamp=1500)
    idx2 = open_index(spark, uri).consolidate_updates(timestamp=2000)
    idx2.vacuum()  # reclaims the 1500 batch; floor = 2000
    idx2.update(103, V_B, timestamp=3000)
    rows = _drain(spark, uri, str(tmp_path / "ck1"))
    assert {(r.external_id, r.ts) for r in rows} == {(103, 3000)}
    with pytest.raises(StreamingQueryException, match="reclamation floor"):
        _drain(spark, uri, str(tmp_path / "ck2"), startTimestamp="1200")


def test_cdc_replay_below_reclamation_floor_fails_loudly(
    spark, tiny_source, tmp_path
):
    """After consolidate + vacuum reclaim the window a checkpoint points
    into, the restart must raise (partial replay = silent event loss),
    naming the floor."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    uri = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    idx = FlatIndex.ingest(spark, uri, tiny_source, timestamp=1000)
    idx.update(100, V_A, timestamp=1500)
    rows = _drain(spark, uri, ckpt, startTimestamp="1200")
    assert len(rows) == 1  # checkpoint offset now ts=1500... but lo=1200
    # fold + vacuum: history dies, floor moves to 2000 ≥ the
    # checkpoint's window start
    idx2 = open_index(spark, uri).consolidate_updates(timestamp=2000)
    idx2.vacuum()
    idx2.update(103, V_B, timestamp=3000)
    with pytest.raises(StreamingQueryException, match="reclamation floor"):
        _drain(spark, uri, ckpt)