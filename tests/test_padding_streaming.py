"""Result padding, dims validation, and streaming updates ingestion."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes import FlatIndex, IVFFlatIndex, open_index
from tiledb_vector_search_spark.streaming import (
    hourly_rollup_stream,
    stream_updates_to_index,
)


@pytest.fixture(scope="module")
def small_source(spark):
    rows = [(i, [float(i), float(i + 1), 0.0, 1.0]) for i in range(6)]
    return spark.createDataFrame(rows, "external_id long, vector array<float>")


@pytest.fixture(scope="module")
def small_index(spark, small_source, tmp_path_factory):
    uri = str(tmp_path_factory.mktemp("pad") / "flat")
    return FlatIndex.ingest(spark, uri, small_source, timestamp=1000)


def _queries(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "query_id long, vector array<float>"
    )


def test_padding_short_results(spark, small_index):
    """k > corpus size → exactly k rows per query, null-padded (reference
    sentinel padding, index.py:346-350; nulls per SURVEY §1.3)."""
    q = _queries(spark, [[0.0, 0.0, 0.0, 1.0]])
    res = small_index.query(q, k=10, pad=True, strategy="expr")
    rows = res.orderBy("rank").collect()
    assert len(rows) == 10
    real = [r for r in rows if r.external_id is not None]
    padded = [r for r in rows if r.external_id is None]
    assert len(real) == 6 and len(padded) == 4
    assert all(r.distance is None for r in padded)
    assert [r.rank for r in rows] == list(range(1, 11))


def test_padding_noop_when_full(spark, small_index):
    q = _queries(spark, [[0.0, 0.0, 0.0, 1.0]])
    res = small_index.query(q, k=3, pad=True, strategy="expr").collect()
    assert len(res) == 3
    assert all(r.external_id is not None for r in res)


def test_padding_ivf(spark, small_source, tmp_path):
    idx = IVFFlatIndex.ingest(
        spark, str(tmp_path / "ivfpad"), small_source, partitions=2, timestamp=1000
    )
    q = _queries(spark, [[0.0, 0.0, 0.0, 1.0]])
    res = idx.query(q, k=10, nprobe=2, pad=True).collect()
    assert len(res) == 10


def test_dims_validation(spark, small_index):
    bad = _queries(spark, [[1.0, 2.0]])  # 2 dims vs index's 4
    with pytest.raises(ValueError, match="dimensions"):
        small_index.query(bad, 3)


def test_stream_updates_to_index(spark, small_source, tmp_path):
    uri = str(tmp_path / "sidx")
    FlatIndex.ingest(spark, uri, small_source, timestamp=1000)

    # file-source stream: write two micro-batch files of updates
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    upd1 = spark.createDataFrame(
        [(100, [9.0, 9.0, 9.0, 9.0], False), (0, None, True)],
        "external_id long, vector array<float>, is_del boolean",
    )
    upd1.write.parquet(str(in_dir / "b1.parquet"))
    stream = (
        spark.readStream.schema(
            "external_id long, vector array<float>, is_del boolean"
        ).parquet(str(in_dir) + "/*")
    )
    qry = stream_updates_to_index(
        stream,
        uri,
        checkpoint_dir=str(tmp_path / "ckpt"),
        delete_col="is_del",
    )
    qry.awaitTermination(120)

    idx = open_index(spark, uri)
    ids = {r.external_id for r in idx.effective_vectors().collect()}
    assert 100 in ids  # streamed upsert landed
    assert 0 not in ids  # streamed tombstone applied
    # streamed updates consolidate like batch DML (no explicit ts: the
    # streamed batches carry wall-clock stamps, and consolidating at an
    # EARLIER logical ts now raises — see consolidate_updates' guard)
    idx2 = idx.consolidate_updates()
    assert {r.external_id for r in idx2.effective_vectors().collect()} == ids


def test_hourly_rollup_stream_matches_batch(spark, tmp_path):
    rows = [
        ("2024-01-01 10:05:00", "click", 1.5),
        ("2024-01-01 10:45:00", "click", 2.5),
        ("2024-01-01 11:05:00", "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    src = tmp_path / "events"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(str(src))
    rolled = hourly_rollup_stream(stream)
    q = (
        rolled.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.hour), r.event_type): (r.n, float(r.total_value))
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    assert got[("2024-01-01 10:00:00", "click")] == (2, 4.0)
    assert got[("2024-01-01 11:00:00", "view")] == (1, 3.0)


def test_stream_requires_streaming_df(spark, small_source):
    with pytest.raises(ValueError, match="streaming"):
        stream_updates_to_index(small_source, "x", "y")
    with pytest.raises(ValueError, match="streaming"):
        hourly_rollup_stream(small_source)
    from tiledb_vector_search_spark.streaming import sessionize_stream

    with pytest.raises(ValueError, match="streaming"):
        sessionize_stream(small_source)


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions emit once the
    watermark passes session_end + gap (gap-closed sessions wait in
    state until then — eager same-batch emission would race late
    within-watermark events); open sessions are never emitted."""
    from tiledb_vector_search_spark.streaming import sessionize_stream

    schema = "user_id long, ts timestamp"
    src = tmp_path / "sess"
    batch1 = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 11:00:00"),
        (1, "2024-01-01 11:05:00"),
        (1, "2024-01-01 13:00:00"),
        (2, "2024-01-01 09:00:00"),
    ]
    batch2 = [(3, "2024-01-01 14:00:00")]

    def write(rows, mode):
        df = spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        )
        df.repartition(1).write.mode(mode).parquet(str(src))

    write(batch1, "overwrite")
    time.sleep(1.1)  # distinct mtimes → deterministic file→batch order
    write(batch2, "append")

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    assert got == {
        # user 1: two sessions closed by mid-batch gaps
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
        (1, "2024-01-01 11:00:00", "2024-01-01 11:05:00", 2),
        # user 2: closed by event-time timeout when batch 2's watermark
        # (14:00 − 1h = 13:00) passes 09:00 + 30 min
        (2, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1),
        # user 1's 13:00 session and user 3 remain open → not emitted
    }


def test_dedup_stream_drops_repeats(spark, tmp_path):
    from tiledb_vector_search_spark.streaming import dedup_stream

    rows = [
        ("2024-01-01 10:00:00", 1, "alpha beta"),
        ("2024-01-01 10:00:30", 2, "alpha beta"),   # byte-identical repeat
        ("2024-01-01 10:01:00", 3, "gamma delta"),
        ("2024-01-01 10:01:30", 4, "alpha beta"),   # another repeat
    ]
    df = spark.createDataFrame(rows, "ts string, doc_id long, text string")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    src = tmp_path / "docs"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(
        "ts timestamp, doc_id long, text string"
    ).parquet(str(src))
    q = (
        dedup_stream(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r.text for r in spark.sql("SELECT * FROM dedup_stream_test").collect()
    )
    assert got == ["alpha beta", "gamma delta"]
    # the hash key is internal — the output schema is the input schema
    cols = spark.sql("SELECT * FROM dedup_stream_test").columns
    assert cols == ["ts", "doc_id", "text"]


def test_dedup_stream_requires_streaming_df(spark, small_source):
    from tiledb_vector_search_spark.streaming import dedup_stream

    with pytest.raises(ValueError, match="streaming"):
        dedup_stream(small_source)


def test_stream_search_index(spark, small_source, small_index, tmp_path):
    """A query STREAM searched per micro-batch: results match the batch
    query path exactly, and a mid-stream index update is visible at the
    next micro-batch boundary."""
    from tiledb_vector_search_spark.streaming import stream_search_index

    uri = small_index.storage.uri
    in_dir = tmp_path / "qin"
    in_dir.mkdir()
    q1 = spark.createDataFrame(
        [(0, [0.0, 1.0, 0.0, 1.0]), (1, [5.0, 6.0, 0.0, 1.0])],
        "query_id long, vector array<float>",
    )
    q1.write.parquet(str(in_dir / "b1.parquet"))
    stream = spark.readStream.schema(
        "query_id long, vector array<float>"
    ).parquet(str(in_dir) + "/*")

    got: dict[int, list] = {}

    def sink(df, batch_id):
        got[batch_id] = df.collect()

    qry = stream_search_index(
        stream,
        uri,
        k=3,
        sink=sink,
        checkpoint_dir=str(tmp_path / "qckpt"),
    )
    qry.awaitTermination(120)

    rows = [r for rs in got.values() for r in rs]
    assert len(rows) == 2 * 3
    want = {
        (r.query_id, r.rank, r.external_id)
        for r in small_index.query(q1, 3).collect()
    }
    assert {(r.query_id, r.rank, r.external_id) for r in rows} == want

    # second micro-batch sees a new upsert at the batch boundary
    small_index.update(500, [40.0, 40.0, 40.0, 40.0], timestamp=5000)
    q2 = spark.createDataFrame(
        [(2, [40.0, 40.0, 40.0, 40.0])], "query_id long, vector array<float>"
    )
    q2.write.parquet(str(in_dir / "b2.parquet"))
    got.clear()
    qry2 = stream_search_index(
        stream, uri, k=1, sink=sink,
        checkpoint_dir=str(tmp_path / "qckpt"),
    )
    qry2.awaitTermination(120)
    rows = [r for rs in got.values() for r in rs]
    assert [r.external_id for r in rows] == [500]  # the fresh upsert wins


def test_stream_search_rejects_batch_frame(spark, small_source):
    from tiledb_vector_search_spark.streaming import stream_search_index

    with pytest.raises(ValueError, match="streaming"):
        stream_search_index(small_source, "x", 3, sink=lambda df, b: None)


def test_stream_search_with_recall_target(spark, tmp_path):
    """The measured operating point flows through the streaming surface:
    query_kwargs={"recall_target": t} resolves per micro-batch from the
    snapshot the batch re-opens — identical rows to the batch path."""
    from tiledb_vector_search_spark.indexes import IVFFlatIndex
    from tiledb_vector_search_spark.streaming import stream_search_index

    rows = [
        (i, [float(i % 13), float((i * 7) % 11), float(i % 5), 1.0])
        for i in range(120)
    ]
    src = spark.createDataFrame(
        rows, "external_id long, vector array<float>"
    )
    uri = str(tmp_path / "ivf_rt")
    idx = IVFFlatIndex.ingest(
        spark, uri, src, partitions=4, timestamp=1000, recall_curve=True
    )
    q = _queries(spark, [[1.0, 2.0, 1.0, 1.0], [9.0, 4.0, 3.0, 1.0]])
    in_dir = tmp_path / "rtq"
    in_dir.mkdir()
    q.write.parquet(str(in_dir / "b1.parquet"))
    stream = spark.readStream.schema(
        "query_id long, vector array<float>"
    ).parquet(str(in_dir) + "/*")
    got = []

    def sink(df, batch_id):
        got.extend(df.collect())

    sq = stream_search_index(
        stream, uri, k=3, sink=sink,
        checkpoint_dir=str(tmp_path / "rtckpt"),
        query_kwargs={"recall_target": 0.9},
    )
    sq.awaitTermination(120)
    want = {
        (r.query_id, r.rank, r.external_id)
        for r in idx.query(q, 3, recall_target=0.9).collect()
    }
    assert {(r.query_id, r.rank, r.external_id) for r in got} == want
    assert len(got) == 6


def test_sessionize_stream_late_event_extends_pending_session(spark, tmp_path):
    """A late-but-within-watermark event must land in its session before
    that session is emitted — the watermark contract.  Regression: the
    first cut emitted gap-closed sessions in the SAME batch (append
    mode, un-retractable), so a 10:20 event arriving one batch after
    10:00 and 11:00 produced (10:00, 10:00) + a session containing an
    event before its own start; the batch twin on the full event set
    says (10:00–10:20) and (11:00)."""
    from tiledb_vector_search_spark.streaming import sessionize_stream

    schema = "user_id long, ts timestamp"
    src = tmp_path / "sess_late"

    def write(rows, mode):
        df = spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        )
        df.repartition(1).write.mode(mode).parquet(str(src))

    # batch 1: two events a > gap apart; batch 2: the LATE 10:20 (batch-2
    # watermark is 11:00 − 1h = 10:00, so it is honored, not dropped)
    # plus a user-8 event that advances the watermark; batch 3: another
    # user-8 event pushing the watermark past user 7's last+gap
    write([(7, "2024-01-01 10:00:00"), (7, "2024-01-01 11:00:00")], "overwrite")
    time.sleep(1.1)
    write([(7, "2024-01-01 10:20:00"), (8, "2024-01-01 15:00:00")], "append")
    time.sleep(1.1)
    write([(8, "2024-01-01 16:00:00")], "append")

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sess_late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM sess_late_test").collect()
    }
    assert got == {
        (7, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 2),
        (7, "2024-01-01 11:00:00", "2024-01-01 11:00:00", 1),
        # user 8's sessions stay open (watermark never passes them)
    }


def test_stream_updates_trigger_precedence(spark, tmp_path, monkeypatch):
    """An explicit trigger must win over the available_now DEFAULT: with
    the branches inverted, a caller's processingTime=... (the documented
    continuous mode) silently became a drain-and-STOP stream."""
    import pyspark.sql.streaming.query as _q  # noqa: F401
    from pyspark.sql.streaming.readwriter import DataStreamWriter

    captured = {}
    real_trigger = DataStreamWriter.trigger

    def spy_trigger(self, **kw):
        captured.update(kw)
        return real_trigger(self, **kw)

    monkeypatch.setattr(DataStreamWriter, "trigger", spy_trigger)
    monkeypatch.setattr(DataStreamWriter, "start", lambda self, *a, **k: None)
    src = tmp_path / "noop_in"
    spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 1.0])], "external_id long, vector array<float>"
    ).write.parquet(str(src))
    stream = spark.readStream.schema(
        "external_id long, vector array<float>"
    ).parquet(str(src))
    stream_updates_to_index(
        stream, "unused://idx", str(tmp_path / "ck"),
        processingTime="10 seconds",
    )
    assert captured == {"processingTime": "10 seconds"}
    captured.clear()
    stream_updates_to_index(stream, "unused://idx", str(tmp_path / "ck2"))
    assert captured == {"availableNow": True}
