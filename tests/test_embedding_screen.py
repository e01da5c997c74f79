"""stream_embedding_screen: the semantic crawl screen (vector-index twin
of stream_dedup_against / stream_crawl_loop).

Pins: reject-vs-accept against a numpy brute-force oracle, feed-forward
growth (batch N+1 screens against batch N's accepts), the documented
within-batch hole (batch-mates never reject each other), replay
determinism (a redelivered batch reproduces its accept set exactly once
its own ids live in the index), the inner-product orientation, and the
fresh-ids integration check.
"""

from __future__ import annotations

import numpy as np
import pytest

SCHEMA = "external_id long, vector array<float>"


def _seed_index(spark, uri, metric="sum_of_squares"):
    from tiledb_vector_search_spark.indexes import FlatIndex

    # three well-separated corpus vectors
    rows = [
        (0, [10.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 10.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 10.0, 0.0]),
    ]
    src = spark.createDataFrame(rows, SCHEMA)
    return FlatIndex.ingest(spark, uri, src, metric=metric, timestamp=1000)


def _run(spark, in_dir, ckpt, uri, sink, **kw):
    from tiledb_vector_search_spark.streaming import stream_embedding_screen

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = stream_embedding_screen(
        stream, uri, sink=sink, checkpoint_dir=str(ckpt), **kw
    )
    q.awaitTermination(180)


def test_screen_matches_bruteforce_oracle(spark, tmp_path):
    idx = _seed_index(spark, str(tmp_path / "ix"))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    batch = [
        (10, [10.0, 0.1, 0.0, 0.0]),   # near seed 0 -> reject
        (11, [5.0, 5.0, 5.0, 5.0]),    # novel -> accept
        (12, [0.0, 0.0, 10.2, 0.0]),   # near seed 2 -> reject
    ]
    spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(str(in_dir / "b1.parquet"))
    got = {}

    def sink(acc, matches, bid):
        got[bid] = (acc.collect(), matches.collect())

    _run(spark, in_dir, tmp_path / "ck1", idx.storage.uri, sink, threshold=1.0)
    (acc, matches), = got.values()
    # numpy oracle: reject iff min sq-L2 to any seed <= 1.0
    seeds = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], float)
    expect_acc = set()
    for cid, v in batch:
        d = ((seeds - np.array(v)) ** 2).sum(axis=1).min()
        if d > 1.0:
            expect_acc.add(cid)
    assert {r.external_id for r in acc} == expect_acc == {11}
    assert {(r.new_id, r.ref_id) for r in matches} == {(10, 0), (12, 2)}
    # accepted rows carry ALL input columns
    assert set(acc[0].asDict()) == {"external_id", "vector"}


def test_feed_forward_growth_and_batchmate_hole(spark, tmp_path):
    """Batch 1: two near-copies of each other (both novel vs the seeds)
    BOTH survive — the documented within-batch hole.  Batch 2: a
    near-copy of a batch-1 accept is rejected — add_survivors fed the
    accepts forward through the updates log."""
    idx = _seed_index(spark, str(tmp_path / "ix"))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    b1 = [
        (20, [7.0, 7.0, 0.0, 0.0]),    # novel
        (21, [7.0, 7.1, 0.0, 0.0]),    # near-copy of 20, same batch
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(in_dir / "b1.parquet"))
    accepted_by_batch = {}

    def sink(acc, matches, bid):
        accepted_by_batch[bid] = {r.external_id for r in acc.collect()}

    _run(
        spark, in_dir, tmp_path / "ck", idx.storage.uri, sink,
        threshold=1.0, add_survivors=True,
    )
    assert accepted_by_batch == {0: {20, 21}}  # batch-mates never reject

    b2 = [
        (30, [7.05, 7.0, 0.0, 0.0]),   # near batch-1 accept 20 -> reject
        (31, [0.0, 0.0, 0.0, 9.0]),    # novel -> accept
    ]
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(in_dir / "b2.parquet"))
    accepted_by_batch.clear()
    _run(
        spark, in_dir, tmp_path / "ck", idx.storage.uri, sink,
        threshold=1.0, add_survivors=True,
    )
    assert accepted_by_batch == {1: {31}}

    # replay determinism: a fresh checkpoint redelivers both batches;
    # the batch's own ids now live in the index (latest-wins upserts),
    # and the batch-id exclusion reproduces the original accepts exactly
    accepted_by_batch.clear()
    _run(
        spark, in_dir, tmp_path / "ck_replay", idx.storage.uri, sink,
        threshold=1.0, add_survivors=True,
    )
    assert accepted_by_batch == {0: {20, 21}, 1: {31}}


def test_inner_product_orientation(spark, tmp_path):
    """On an inner_product index larger = more similar: duplicates are
    score >= threshold, not <=."""
    idx = _seed_index(spark, str(tmp_path / "ip"), metric="inner_product")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    batch = [
        (40, [10.0, 0.0, 0.0, 0.0]),   # ip 100 with seed 0 -> reject
        (41, [0.1, 0.1, 0.1, 5.0]),    # max ip 1.0 -> accept
    ]
    spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(str(in_dir / "b.parquet"))
    got = {}

    def sink(acc, matches, bid):
        got[bid] = {r.external_id for r in acc.collect()}

    _run(spark, in_dir, tmp_path / "ck", idx.storage.uri, sink, threshold=50.0)
    assert got == {0: {41}}


def test_check_fresh_ids_raises_on_collision(spark, tmp_path):
    idx = _seed_index(spark, str(tmp_path / "ix"))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(
        [(1, [9.0, 9.0, 9.0, 9.0])], SCHEMA  # id 1 already indexed
    ).coalesce(1).write.parquet(str(in_dir / "b.parquet"))
    from pyspark.sql.streaming import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="fresh"):
        _run(
            spark, in_dir, tmp_path / "ck", idx.storage.uri,
            lambda a, m, b: None, threshold=1.0, check_fresh_ids=True,
        )


def test_rejects_batch_frame(spark, tmp_path):
    from tiledb_vector_search_spark.streaming import stream_embedding_screen

    df = spark.createDataFrame([(1, [0.0])], SCHEMA)
    with pytest.raises(ValueError, match="streaming"):
        stream_embedding_screen(df, "x", sink=lambda a, m, b: None, threshold=1.0)


def test_screen_within_batch_canonicals(spark, tmp_path):
    """Three intra-batch near-copies (all novel vs the index) collapse
    to the min-id canonical; both dropped members appear in matches;
    replay with the batch already upserted reproduces the accepts."""
    idx = _seed_index(spark, str(tmp_path / "ix"))
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    b1 = [
        (50, [6.0, 6.0, 6.0, 0.0]),     # canonical (min id of the group)
        (51, [6.0, 6.0, 6.05, 0.0]),    # near-copy -> dropped
        (52, [6.05, 6.0, 6.0, 0.0]),    # near-copy -> dropped
        (53, [0.0, 9.0, 0.0, 9.0]),     # unrelated novel -> accepted
        (54, [10.0, 0.2, 0.0, 0.0]),    # near seed 0 -> index-rejected
    ]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "b1.parquet")
    )
    got = {}

    def sink(acc, matches, bid):
        got[bid] = (
            {r.external_id for r in acc.collect()},
            {(r.new_id, r.ref_id) for r in matches.collect()},
        )

    _run(
        spark, in_dir, tmp_path / "ck", idx.storage.uri, sink,
        threshold=1.0, add_survivors=True, screen_within_batch=True,
        within_batch_nprobe=4,
    )
    acc, matches = got[0]
    assert acc == {50, 53}
    # both dropped members reported (new_id = dropped), plus the index
    # rejection of 54
    dropped_new = {n for n, _ in matches}
    assert {51, 52}.issubset(dropped_new)
    assert (54, 0) in matches
    # only canonicals entered the index: a batch-2 copy of the dropped
    # member 51's vector now near-dups the CANONICAL 50 in the index
    spark.createDataFrame(
        [(60, [6.0, 6.0, 6.05, 0.0])], SCHEMA
    ).coalesce(1).write.parquet(str(in_dir / "b2.parquet"))
    got.clear()
    _run(
        spark, in_dir, tmp_path / "ck", idx.storage.uri, sink,
        threshold=1.0, add_survivors=True, screen_within_batch=True,
    )
    acc2, matches2 = got[1]
    assert acc2 == set()
    assert any(n == 60 and r == 50 for n, r in matches2)
    # replay: fresh checkpoint, batch ids live in the index -> the
    # within-batch screen (deterministic routing) + batch-id exclusion
    # reproduce the accepts exactly
    got.clear()
    _run(
        spark, in_dir, tmp_path / "ck_replay", idx.storage.uri, sink,
        threshold=1.0, add_survivors=True, screen_within_batch=True,
    )
    assert got[0][0] == {50, 53} and got[1][0] == set()


def test_screen_composes_with_recall_target_and_u8(spark, tmp_path):
    """The measured-operating-point knob flows through query_kwargs
    (resolved per batch from the snapshot), and a packed byte-dtype
    corpus screens with float candidates."""
    from tiledb_vector_search_spark.indexes import FlatIndex, IVFFlatIndex

    # recall_target through an IVF index with a persisted curve
    rows = [
        (i, [float(i % 13), float((i * 7) % 11), float(i % 5), 1.0])
        for i in range(120)
    ]
    src = spark.createDataFrame(rows, SCHEMA)
    ivf = IVFFlatIndex.ingest(
        spark, str(tmp_path / "ivf"), src, partitions=4, timestamp=1000,
        recall_curve=True,
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    batch = [
        (500, [1.0, 0.0, 1.0, 1.0]),       # collides with corpus region
        (501, [100.0, 100.0, 100.0, 1.0]), # far away
    ]
    spark.createDataFrame(batch, SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "b.parquet")
    )
    got = {}

    def sink(acc, matches, bid):
        got[bid] = {r.external_id for r in acc.collect()}

    _run(
        spark, in_dir, tmp_path / "ck", str(tmp_path / "ivf"), sink,
        threshold=2.0, query_kwargs={"recall_target": 1.0},
    )
    assert got[0] == {501}

    # packed u8 corpus, float candidates
    u8src = spark.createDataFrame(
        [(0, [10.0, 0.0, 0.0, 0.0]), (1, [0.0, 10.0, 0.0, 0.0])], SCHEMA
    )
    u8 = FlatIndex.ingest(
        spark, str(tmp_path / "u8"), u8src, vector_dtype="uint8",
        timestamp=1000,
    )
    in2 = tmp_path / "in2"
    in2.mkdir()
    spark.createDataFrame(
        [(600, [10.0, 0.0, 0.0, 0.0]), (601, [3.0, 3.0, 3.0, 3.0])], SCHEMA
    ).coalesce(1).write.parquet(str(in2 / "b.parquet"))
    got.clear()
    _run(spark, in2, tmp_path / "ck2", str(tmp_path / "u8"), sink, threshold=1.0)
    assert got[0] == {601}


def test_crash_replay_with_batchmates_in_index_reproduces_accepts(
    spark, tmp_path
):
    """The ADVICE r9 replay hole, closed by the excluded_ids PUSHDOWN:
    a driver that crashed after merge_batch but before the checkpoint
    commit re-delivers the batch to an index that now CONTAINS the
    accepted batch-mates.  Candidate 100 has k batch-mates nearer than
    its true corpus duplicate (id 0); were batch ids merely filtered
    AFTER top-k, the batch-mates would crowd out the duplicate on
    replay and flip the original rejection into an acceptance."""
    from tiledb_vector_search_spark.indexes import FlatIndex
    from tiledb_vector_search_spark.streaming.embedding_screen import (
        embedding_screen_batch,
    )

    idx = _seed_index(spark, str(tmp_path / "idx"))
    k = 2
    threshold = 0.5
    # candidate 100 duplicates corpus id 0 (within threshold); its k
    # batch-mates 101/102 are NEARER to 100 than id 0 is, but far from
    # the corpus (the 5.0 in dim 2), so they are accepted
    batch = spark.createDataFrame(
        [
            (100, [10.01, 0.0, 0.0, 0.0]),      # corpus dup of id 0
            (101, [10.0101, 0.0, 5.0, 0.0]),    # near 100 in 2 dims, off-corpus
            (102, [10.0102, 0.0, 5.0, 0.0]),
        ],
        SCHEMA,
    )
    import pyspark.sql.functions as F

    accepted1, matches1 = embedding_screen_batch(idx, batch, threshold, k=k)
    a1 = {int(r["external_id"]) for r in accepted1.collect()}
    assert a1 == {101, 102}  # 100 rejected by its corpus duplicate
    # crash AFTER the survivors merged, BEFORE the checkpoint commit
    idx.merge_batch(
        accepted1.select("external_id", "vector").withColumn(
            "is_delete", F.lit(False)
        ),
        timestamp=2000,
    )
    replay_idx = FlatIndex(spark, idx.uri)
    accepted2, _ = embedding_screen_batch(replay_idx, batch, threshold, k=k)
    a2 = {int(r["external_id"]) for r in accepted2.collect()}
    assert a2 == a1  # replay reproduces the accept set exactly


def test_excluded_ids_pushdown_all_index_types(spark, tmp_path):
    """excluded_ids removes ids BEFORE top-k on every index type: with
    the two nearest neighbors excluded, the k=1 result is the THIRD
    nearest — a post-filter would return an empty/shorter result."""
    import pyspark.sql.functions as F

    from tiledb_vector_search_spark.indexes import (
        FlatIndex,
        IVFFlatIndex,
        IVFPQIndex,
        VamanaIndex,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )
    q_rows = src.where("external_id = 0").select(
        F.col("external_id").alias("query_id"), "vector"
    )
    # exact truth: 3rd nearest once the top-2 are excluded
    flat = FlatIndex.ingest(spark, str(tmp_path / "f"), src, timestamp=1000)
    top3 = flat.query(q_rows, 3).orderBy("rank").collect()
    excl = spark.createDataFrame(
        [(int(top3[0]["external_id"]),), (int(top3[1]["external_id"]),)],
        "external_id long",
    )
    want = int(top3[2]["external_id"])

    got_flat = flat.query(q_rows, 1, excluded_ids=excl).collect()
    assert [int(r["external_id"]) for r in got_flat] == [want]

    ivf = IVFFlatIndex.ingest(
        spark, str(tmp_path / "i"), src, partitions=8, timestamp=1000
    )
    got = ivf.query(q_rows, 1, nprobe=8, excluded_ids=excl).collect()
    assert [int(r["external_id"]) for r in got] == [want]
    got = ivf.query(
        q_rows, 1, nprobe=8, strategy="join", excluded_ids=excl
    ).collect()
    assert [int(r["external_id"]) for r in got] == [want]

    pq = IVFPQIndex.ingest(
        spark, str(tmp_path / "p"), src, partitions=8, timestamp=1000
    )
    got = pq.query(
        q_rows, 1, nprobe=8, k_factor=4.0, excluded_ids=excl
    ).collect()
    assert [int(r["external_id"]) for r in got] == [want]

    vam = VamanaIndex.ingest(
        spark, str(tmp_path / "v"), src, shards=4, timestamp=1000
    )
    got = vam.query(q_rows, 1, nprobe=4, excluded_ids=excl).collect()
    assert [int(r["external_id"]) for r in got] == [want]
