"""MinHashReference artifact + streaming dedup-against: parity with the
one-shot operator, crash-atomic growth, snapshot-per-batch streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.operators.dedup import (
    MinHashReference,
    minhash_dedup_against,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs(df):
    return sorted(
        (r.new_id, r.ref_id, r.jaccard)
        for r in df.select("new_id", "ref_id", "jaccard").collect()
    )


def _planted(docs, n=5, offset=900000):
    """Near-copies of the first ``n`` reference docs (one token appended
    → jaccard just below 1.0, far above the 0.8 threshold)."""
    return docs.where(f"doc_id < {n}").select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.concat("text", F.lit(" trailer")).alias("text"),
    )


def test_artifact_match_equals_one_shot(spark, docs, tmp_path):
    ref = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 2 = 1").unionByName(_planted(ref))
    art = MinHashReference.build(spark, str(tmp_path / "ref"), ref)
    got = _pairs(art.match(new, threshold=0.8))
    want = _pairs(minhash_dedup_against(new, ref, threshold=0.8))
    assert got == want and len(got) >= 3  # planted hits present
    planted_new = {r.doc_id for r in _planted(ref).select("doc_id").collect()}
    hit_new = {p[0] for p in got}
    assert planted_new <= hit_new


def test_artifact_add_documents_equals_fresh_build(spark, docs, tmp_path):
    ref_a = docs.where("doc_id % 4 = 0")
    ref_b = docs.where("doc_id % 4 = 2")
    new = _planted(ref_b, n=40)  # near-dups of the INCREMENT only
    inc = MinHashReference.build(spark, str(tmp_path / "inc"), ref_a)
    before = _pairs(inc.match(new, threshold=0.8))
    inc.add_documents(ref_b)
    got = _pairs(inc.match(new, threshold=0.8))
    fresh = MinHashReference.build(
        spark, str(tmp_path / "fresh"), ref_a.unionByName(ref_b)
    )
    assert got == _pairs(fresh.match(new, threshold=0.8))
    assert len(got) > len(before)  # the increment's dups only appear after
    # reopening resolves the committed batch
    reopened = MinHashReference(spark, inc.uri)
    assert _pairs(reopened.match(new, threshold=0.8)) == got


def test_artifact_add_crash_atomic(spark, docs, tmp_path, monkeypatch):
    import pyspark.sql.readwriter as RW

    ref_a = docs.where("doc_id % 4 = 0")
    ref_b = docs.where("doc_id % 4 = 2")
    art = MinHashReference.build(spark, str(tmp_path / "crash"), ref_a)
    before_meta = dict(art.meta)
    new = _planted(ref_a, n=10)
    before = _pairs(art.match(new, threshold=0.8))

    real_parquet = RW.DataFrameWriter.parquet

    def exploding(self, path, *a, **kw):
        out = real_parquet(self, path, *a, **kw)
        if "bands_batches" in path:
            raise RuntimeError("injected crash after bands batch write")
        return out

    monkeypatch.setattr(RW.DataFrameWriter, "parquet", exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        art.add_documents(ref_b)
    monkeypatch.setattr(RW.DataFrameWriter, "parquet", real_parquet)

    reopened = MinHashReference(spark, art.uri)
    assert dict(reopened.meta) == before_meta
    assert _pairs(reopened.match(new, threshold=0.8)) == before
    # retry completes and equals a fresh union build
    reopened.add_documents(ref_b)
    fresh = MinHashReference.build(
        spark, str(tmp_path / "fresh"), ref_a.unionByName(ref_b)
    )
    assert _pairs(reopened.match(new, threshold=0.8)) == _pairs(
        fresh.match(new, threshold=0.8)
    )


def test_stream_dedup_against_e2e(spark, docs, tmp_path):
    """2 micro-batches through a file source: planted near-dups flagged
    per batch, rows deterministic under re-processing (exactly-once via
    idempotent re-delivery), and a checkpointed restart with no new
    files emits nothing."""
    from tiledb_vector_search_spark.streaming.dedup_against import (
        stream_dedup_against,
    )

    ref = docs.where("doc_id % 2 = 0")
    art_uri = str(tmp_path / "ref")
    MinHashReference.build(spark, art_uri, ref)

    # batch 0: planted dups of ref ids 0..9; batch 1: of ref ids 10..29
    b0 = _planted(ref, n=10, offset=900000)
    b1 = ref.where("doc_id >= 10 AND doc_id < 30").select(
        (F.col("doc_id") + 950000).alias("doc_id"),
        F.concat("text", F.lit(" trailer")).alias("text"),
    )
    in_dir = tmp_path / "in"
    b0.coalesce(1).write.parquet(str(in_dir / "batch=0"))
    b1.coalesce(1).write.parquet(str(in_dir / "batch=1"))

    results: dict[int, list] = {}

    def sink(df, bid):
        results[bid] = _pairs(df)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch=*"))
    )
    ckpt = str(tmp_path / "ckpt")
    sq = stream_dedup_against(
        stream, art_uri, sink, threshold=0.8, checkpoint_dir=ckpt
    )
    sq.awaitTermination()
    assert len(results) == 2
    all_new = {p[0] for rows in results.values() for p in rows}
    # ref holds only EVEN ids, so the planted copies that can match are
    # the even-seeded ones
    planted = {900000 + i for i in range(0, 10, 2)} | {
        950000 + i for i in range(10, 30, 2)
    }
    assert planted <= all_new
    # per-batch determinism: re-processing each batch's docs through the
    # batch API reproduces the streamed rows exactly (what makes
    # re-delivery idempotent)
    ref_art = MinHashReference(spark, art_uri)
    streamed = sorted(p for rows in results.values() for p in rows)
    redo = sorted(
        _pairs(ref_art.match(b0, threshold=0.8))
        + _pairs(ref_art.match(b1, threshold=0.8))
    )
    assert streamed == redo
    # restart from the checkpoint with no new input: no batches fire
    results.clear()
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch=*"))
    )
    sq2 = stream_dedup_against(
        stream2, art_uri, sink, threshold=0.8, checkpoint_dir=ckpt
    )
    sq2.awaitTermination()
    assert results == {}
    # grow + consolidate the artifact BETWEEN restarts: the next
    # micro-batch must resolve the new generation through the meta
    # pointer (per-batch re-open) — dups of the folded increment are
    # found even though the pre-fold dirs are gone
    inc = docs.where("doc_id % 2 = 1 AND doc_id < 60")
    ref_art.add_documents(inc)
    ref_art.consolidate()
    assert ref_art.describe()["generation"] == 1
    b2 = inc.where("doc_id < 20").select(
        (F.col("doc_id") + 980000).alias("doc_id"),
        F.concat("text", F.lit(" trailer")).alias("text"),
    )
    b2.coalesce(1).write.parquet(str(in_dir / "batch=2"))
    results.clear()
    stream3 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch=*"))
    )
    sq3 = stream_dedup_against(
        stream3, art_uri, sink, threshold=0.8, checkpoint_dir=ckpt
    )
    sq3.awaitTermination()
    flagged = {p[0] for rows in results.values() for p in rows}
    assert {980000 + i for i in range(1, 20, 2)} <= flagged


def test_artifact_consolidate_bit_identical_and_zeroes_debt(
    spark, docs, tmp_path
):
    """Pre/post-consolidate match() is BIT-IDENTICAL; the fold zeroes the
    batch debt, bumps the generation, and physically removes the
    per-increment dirs (the small-files debt a crawl pipeline
    accumulates); growth after the fold still equals a fresh build."""
    import os

    ref_a = docs.where("doc_id % 4 = 0")
    ref_b = docs.where("doc_id % 4 = 2")
    ref_c = docs.where("doc_id % 4 = 1")
    art = MinHashReference.build(spark, str(tmp_path / "cons"), ref_a)
    art.add_documents(ref_b)
    art.add_documents(ref_c)
    new = _planted(ref_b, n=40).unionByName(_planted(ref_c, n=40))
    assert art.describe()["batch_debt"] == 2
    before = _pairs(art.match(new, threshold=0.8))
    art.consolidate()
    d = art.describe()
    assert d["batch_debt"] == 0 and d["generation"] == 1
    assert _pairs(art.match(new, threshold=0.8)) == before
    # the per-increment dirs are physically gone (GC after the flip)
    assert not os.path.exists(str(tmp_path / "cons" / "bands_batches"))
    assert not os.path.exists(str(tmp_path / "cons" / "bands"))
    assert os.path.exists(str(tmp_path / "cons" / "bands_gen1"))
    # a reopen resolves the generation pointer
    reopened = MinHashReference(spark, art.uri)
    assert _pairs(reopened.match(new, threshold=0.8)) == before
    # zero-debt consolidate is a no-op
    art.consolidate()
    assert art.describe()["generation"] == 1
    # growth after the fold still equals a fresh union build
    ref_d = docs.where("doc_id % 4 = 3")
    art.add_documents(ref_d)
    fresh = MinHashReference.build(
        spark,
        str(tmp_path / "cons_fresh"),
        ref_a.unionByName(ref_b).unionByName(ref_c).unionByName(ref_d),
    )
    new2 = _planted(ref_d, n=40)
    assert _pairs(art.match(new2, threshold=0.8)) == _pairs(
        fresh.match(new2, threshold=0.8)
    )


def test_artifact_consolidate_crash_atomic(spark, docs, tmp_path, monkeypatch):
    """A crash between the gen-dir writes and the meta flip leaves the
    artifact byte-identical (readers never resolve unreferenced gen
    dirs); the retry completes the fold."""
    import pyspark.sql.readwriter as RW

    ref_a = docs.where("doc_id % 4 = 0")
    ref_b = docs.where("doc_id % 4 = 2")
    art = MinHashReference.build(spark, str(tmp_path / "cfold"), ref_a)
    art.add_documents(ref_b)
    new = _planted(ref_b, n=40)
    before = _pairs(art.match(new, threshold=0.8))
    before_meta = dict(art.meta)

    real_parquet = RW.DataFrameWriter.parquet

    def exploding(self, path, *a, **kw):
        out = real_parquet(self, path, *a, **kw)
        if "bands_gen" in path:
            raise RuntimeError("injected crash after gen bands write")
        return out

    monkeypatch.setattr(RW.DataFrameWriter, "parquet", exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        art.consolidate()
    monkeypatch.setattr(RW.DataFrameWriter, "parquet", real_parquet)

    reopened = MinHashReference(spark, art.uri)
    assert dict(reopened.meta) == before_meta
    assert _pairs(reopened.match(new, threshold=0.8)) == before
    # retry completes; orphan gen dirs from the crash are overwritten
    reopened.consolidate()
    assert _pairs(reopened.match(new, threshold=0.8)) == before
    assert reopened.describe()["batch_debt"] == 0


def test_add_documents_idempotency_key(spark, docs, tmp_path):
    """A re-delivered key is a no-op in data AND meta; a fresh key
    applies; the ledger survives consolidate()."""
    ref_a = docs.where("doc_id % 4 = 0")
    inc_b = docs.where("doc_id % 4 = 2")
    inc_c = docs.where("doc_id % 4 = 1")
    probe = _planted(inc_b, n=20).unionByName(_planted(inc_c, n=20))
    art = MinHashReference.build(spark, str(tmp_path / "idem"), ref_a)
    art.add_documents(inc_b, idempotency_key="s:0")
    after_first = _pairs(art.match(probe, threshold=0.8))
    meta_first = dict(art.meta)
    # same key again, even with different data: must not run
    art.add_documents(inc_b, idempotency_key="s:0")
    assert dict(art.meta) == meta_first
    # a reopened handle sees the committed ledger
    reopened = MinHashReference(spark, art.uri)
    reopened.add_documents(inc_b, idempotency_key="s:0")
    assert dict(reopened.meta) == meta_first
    assert _pairs(reopened.match(probe, threshold=0.8)) == after_first
    # a fresh key applies; the fold keeps the ledger and the matches
    reopened.add_documents(inc_c, idempotency_key="s:1")
    before_fold = _pairs(reopened.match(probe, threshold=0.8))
    assert before_fold != after_first
    reopened.consolidate()
    assert reopened.meta.get("applied_keys") == ["s:0", "s:1"]
    assert _pairs(reopened.match(probe, threshold=0.8)) == before_fold
    reopened.add_documents(inc_c, idempotency_key="s:1")  # still a no-op
    assert _pairs(reopened.match(probe, threshold=0.8)) == before_fold


def test_stream_minhash_ingest_e2e(spark, docs, tmp_path):
    """2 accepted-doc micro-batches fold into the reference (== fresh
    union build); consolidate_every folds the debt in-loop; a
    checkpointed restart with no new files changes nothing."""
    from tiledb_vector_search_spark.streaming import stream_minhash_ingest

    seed = docs.where("doc_id % 2 = 0")
    b0 = docs.where("doc_id % 4 = 1")
    b1 = docs.where("doc_id % 4 = 3")
    uri = str(tmp_path / "ref")
    MinHashReference.build(spark, uri, seed)

    in_dir = tmp_path / "in"
    b0.coalesce(1).write.parquet(str(in_dir / "batch=0"))
    b1.coalesce(1).write.parquet(str(in_dir / "batch=1"))

    def make_stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "batch=*"))
        )

    ckpt = str(tmp_path / "ckpt")
    sq = stream_minhash_ingest(
        make_stream(), uri, consolidate_every=2, checkpoint_dir=ckpt
    )
    sq.awaitTermination()

    ref = MinHashReference(spark, uri)
    assert ref.describe()["batch_debt"] == 0  # folded in-loop
    assert ref.describe()["generation"] >= 1
    assert len(ref.meta.get("applied_keys", [])) == 2
    probe = _planted(b0, n=20).unionByName(_planted(b1, n=20))
    fresh = MinHashReference.build(
        spark, str(tmp_path / "fresh"),
        seed.unionByName(b0).unionByName(b1),
    )
    streamed = _pairs(ref.match(probe, threshold=0.8))
    assert streamed == _pairs(fresh.match(probe, threshold=0.8))
    # the planted near-dups of both batches (5 ids < 20 in each modulo
    # slice) must all hit
    assert len(streamed) >= 10

    # restart from the checkpoint with no new input: nothing fires
    meta_before = dict(ref.meta)
    sq2 = stream_minhash_ingest(
        make_stream(), uri, consolidate_every=2, checkpoint_dir=ckpt
    )
    sq2.awaitTermination()
    assert dict(MinHashReference(spark, uri).meta) == meta_before


def test_stream_crawl_loop_e2e(spark, docs, tmp_path):
    """screen -> accept -> grow, continuously: every batch's accepted/
    matched sets equal a sequential batch-API mirror of the loop (the
    exact oracle); batch 1's near-copies of batch-0 ACCEPTED docs are
    rejected (the loop feeds forward); a full re-delivery (fresh
    checkpoint, committed keys) reconstructs the accepted sets exactly
    and mutates nothing."""
    from tiledb_vector_search_spark.streaming import stream_crawl_loop

    seed = docs.where("doc_id % 2 = 0")
    organic_a = docs.where("doc_id % 4 = 1")
    organic_b = docs.where("doc_id % 8 = 3")
    uri = str(tmp_path / "ref")
    MinHashReference.build(spark, uri, seed)

    b0 = organic_a.unionByName(_planted(seed, n=20, offset=700000))
    b1 = organic_b.unionByName(_planted(organic_a, n=40, offset=800000))
    in_dir = tmp_path / "in"
    b0.coalesce(1).write.parquet(str(in_dir / "batch=0"))
    b1.coalesce(1).write.parquet(str(in_dir / "batch=1"))

    got: dict[int, tuple] = {}

    def sink(accepted, matches, batch_id):
        got[batch_id] = (
            {int(r.doc_id) for r in accepted.select("doc_id").collect()},
            {(r.new_id, r.ref_id) for r in matches.collect()},
        )

    def make_stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "batch=*"))
        )

    sq = stream_crawl_loop(
        make_stream(), uri, sink, threshold=0.8, stream_id="cl",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    sq.awaitTermination()

    # the exact oracle: replay the loop sequentially through the batch
    # API on a mirror artifact
    mirror = MinHashReference.build(spark, str(tmp_path / "mirror"), seed)
    want: dict[int, tuple] = {}
    for bid, batch in ((0, b0), (1, b1)):
        m = mirror.match(batch, threshold=0.8)
        pairs = {(r.new_id, r.ref_id) for r in m.collect()}
        dup_ids = {nid for nid, _ in pairs}
        acc_ids = {
            int(r.doc_id) for r in batch.select("doc_id").collect()
        } - dup_ids
        want[bid] = (acc_ids, pairs)
        mirror.add_documents(batch.where(
            F.col("doc_id").isin([int(i) for i in acc_ids])
        ))
    assert got == want

    # the planted seed near-copies were rejected in batch 0, and the
    # planted copies of batch-0 ORGANIC docs were rejected in batch 1 —
    # BY the reference grown mid-stream
    assert {nid for nid, _ in got[0][1] if nid >= 700000}
    planted_1 = {
        int(r.doc_id)
        for r in _planted(organic_a, n=40, offset=800000)
        .select("doc_id").collect()
    }
    accepted_a = {i for i in got[0][0] if i < 700000}
    fed_forward = {
        nid for nid, rid in got[1][1]
        if nid in planted_1 and rid in accepted_a
    }
    assert fed_forward  # rejections caused by batch-0 accepts

    # the reference equals the mirror (same accepts, same fold state)
    ref = MinHashReference(spark, uri)
    probe = _planted(organic_a, n=30).unionByName(
        _planted(organic_b, n=30)
    )
    assert _pairs(ref.match(probe, threshold=0.8)) == _pairs(
        mirror.match(probe, threshold=0.8)
    )

    # full re-delivery: fresh checkpoint, same stream_id -> both keys
    # already committed -> accepted sets reconstructed exactly, no
    # mutation, no duplicate ingest
    meta_before = dict(ref.meta)
    got.clear()
    sq2 = stream_crawl_loop(
        make_stream(), uri, sink, threshold=0.8, stream_id="cl",
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    sq2.awaitTermination()
    assert dict(MinHashReference(spark, uri).meta) == meta_before
    assert {frozenset(v[0]) for v in got.values()} == {
        frozenset(want[0][0]), frozenset(want[1][0])
    }


def test_accepted_ids_record_is_increment_sized(spark, docs, tmp_path):
    """A keyed add_documents records the exact committed id set in an
    increment-sized parquet (ids_batches/), readable through
    accepted_ids_for_key without touching the corpus-sized shingle
    tree — and the record survives consolidate()."""
    seed = docs.where("doc_id % 2 = 0")
    inc = docs.where("doc_id % 4 = 1")
    uri = str(tmp_path / "ref")
    MinHashReference.build(spark, uri, seed)
    ref = MinHashReference(spark, uri)
    ref.add_documents(inc, idempotency_key="s:0")
    assert "s:0" in ref.meta["applied_key_batches"]

    ids = ref.accepted_ids_for_key("s:0")
    got = sorted(r.doc_id for r in ids.collect())
    assert got == sorted(r.doc_id for r in inc.select("doc_id").collect())
    # increment-sized read: every input file is the per-batch ids
    # record, never a shingle/band tree file
    files = ids.inputFiles()
    assert files and all("ids_batches" in f for f in files)

    # unknown key -> None (caller falls back)
    assert ref.accepted_ids_for_key("s:999") is None

    # the record outlives the generation fold (batch dirs are folded
    # away, the replay record is not)
    ref.consolidate()
    reopened = MinHashReference(spark, uri)
    ids2 = reopened.accepted_ids_for_key("s:0")
    assert sorted(r.doc_id for r in ids2.collect()) == got
    assert all("ids_batches" in f for f in ids2.inputFiles())


def test_stream_crawl_loop_screen_within_batch(spark, docs, tmp_path):
    """screen_within_batch=True: intra-batch near-dup groups collapse
    to one canonical survivor BEFORE the reference screen; exactly that
    survivor enters the reference; a group whose canonical duplicates
    the corpus is dropped entirely.  The whole mode equals a sequential
    batch-API mirror (minhash_dedup + components + match + add)."""
    from tiledb_vector_search_spark.operators.dedup import (
        connected_components,
        minhash_dedup,
    )
    from tiledb_vector_search_spark.streaming import stream_crawl_loop

    seed = docs.where("doc_id % 2 = 0")
    organic = docs.where("doc_id % 4 = 1")
    uri = str(tmp_path / "ref")
    MinHashReference.build(spark, uri, seed)

    # groups of near-copies of batch docs: organic doc o (canonical),
    # plus copies at o+700000 and o+710000 — all three in ONE batch
    batch = (
        organic.unionByName(_planted(organic, n=10, offset=700000))
        .unionByName(_planted(organic, n=10, offset=710000))
        # a group whose CANONICAL near-duplicates the seed: both copies
        # of seed docs must vanish (canonical rejected by the reference,
        # member dropped with it)
        .unionByName(_planted(seed, n=5, offset=800000))
        .unionByName(_planted(seed, n=5, offset=810000))
    )
    in_dir = tmp_path / "in"
    batch.coalesce(1).write.parquet(str(in_dir / "batch=0"))

    got = {}

    def sink(accepted, matches, batch_id):
        got[batch_id] = (
            {int(r.doc_id) for r in accepted.select("doc_id").collect()},
            {(r.new_id, r.ref_id) for r in matches.collect()},
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch=*"))
    )
    sq = stream_crawl_loop(
        stream, uri, sink, threshold=0.8, stream_id="swb",
        screen_within_batch=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    sq.awaitTermination()

    accepted_ids, match_pairs = got[0]
    organic_ids = {r.doc_id for r in organic.select("doc_id").collect()}
    # every planted intra-batch copy was dropped (canonical = min id =
    # the organic/seed base, never a 7xxxxx/8xxxxx copy), and nothing
    # outside the organic slice entered; the organic slice itself may
    # shrink further — the synthetic corpus contains organic near-dups
    # within the batch, which the intra screen correctly collapses too
    # (the mirror equality below is the exact oracle for that)
    assert accepted_ids <= organic_ids
    assert not {i for i in accepted_ids if i >= 700000}
    # exactly one survivor per planted group entered the reference
    ref = MinHashReference(spark, uri)
    ref_ids = {
        r.doc_id
        for r in spark.read.parquet(*ref._dirs("shingles"))
        .select("doc_id").collect()
    }
    seed_ids = {r.doc_id for r in seed.select("doc_id").collect()}
    assert ref_ids == seed_ids | accepted_ids
    # intra rejections are reported to the sink alongside reference
    # rejections
    assert {(n, r) for n, r in match_pairs if n >= 700000 and r < 700000}

    # sequential batch-API mirror: same two-screen semantics
    mirror = MinHashReference.build(spark, str(tmp_path / "mirror"), seed)
    meta = mirror.meta
    intra = minhash_dedup(
        batch, text_col=meta["text_col"], id_col=meta["id_col"],
        num_perm=meta["num_perm"], bands=meta["bands"],
        threshold=0.8, shingle_n=meta["shingle_n"],
    )
    comp = connected_components(intra, "id_a", "id_b")
    drop = {
        r.doc_id for r in comp.where("doc_id != canonical_id").collect()
    }
    screened = batch.where(~F.col("doc_id").isin([int(i) for i in drop]))
    m = mirror.match(screened, threshold=0.8)
    ref_pairs = {(r.new_id, r.ref_id) for r in m.collect()}
    dup = {n for n, _ in ref_pairs}
    want_accepted = {
        int(r.doc_id) for r in screened.select("doc_id").collect()
    } - dup
    # intra matches contract: every DROPPED doc appears as new_id in at
    # least one of its verified pairs (both orientations of each pair,
    # filtered to dropped new_ids) — NOT the raw (id_a < id_b)
    # orientation, which can miss a dropped doc that only ever appears
    # as id_a (jaccard is not transitive)
    intra_rows = intra.select("id_a", "id_b").collect()
    sym = {(r.id_a, r.id_b) for r in intra_rows} | {
        (r.id_b, r.id_a) for r in intra_rows
    }
    want_pairs = ref_pairs | {(n, r) for (n, r) in sym if n in drop}
    assert accepted_ids == want_accepted
    assert match_pairs == want_pairs
    assert drop <= {n for n, _ in match_pairs}  # no silent removals


def test_within_batch_chain_drop_reported(spark, tmp_path):
    """A dropped doc that appears only as id_a in its verified pairs
    must still be reported to the sink.

    Jaccard is not transitive: docs 3 and 5 each near-duplicate hub 9
    (J ≈ 0.867) without near-duplicating each other (J ≈ 0.735 < 0.8),
    so the verified pairs are exactly (3,9) and (5,9) — one component
    {3,5,9}, canonical 3, dropped {5,9}.  Doc 5 never appears as id_b,
    so deriving the intra matches from the raw (id_a < id_b) pair
    orientation silently removed it with no matches row — regression
    for that: BOTH dropped docs must surface as new_id."""
    from tiledb_vector_search_spark.streaming import stream_crawl_loop

    words = [f"w{i}" for i in range(100)]
    hub = " ".join(words)
    a = " ".join(words[:87])  # J(3,9) = 85/98 ≈ 0.867
    b = " ".join(words[13:])  # J(5,9) ≈ 0.867; J(3,5) = 72/98 ≈ 0.735
    seed = spark.createDataFrame(
        [(1000, "totally unrelated corpus text nothing shared here at all")],
        "doc_id long, text string",
    )
    uri = str(tmp_path / "ref")
    MinHashReference.build(spark, uri, seed)
    batch = spark.createDataFrame(
        [(3, a), (5, b), (9, hub)], "doc_id long, text string"
    )
    in_dir = tmp_path / "in"
    batch.coalesce(1).write.parquet(str(in_dir / "batch=0"))

    got = {}

    def sink(accepted, matches, batch_id):
        got[batch_id] = (
            {int(r.doc_id) for r in accepted.select("doc_id").collect()},
            {(r.new_id, r.ref_id) for r in matches.collect()},
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "batch=*"))
    )
    sq = stream_crawl_loop(
        stream, uri, sink, threshold=0.8, stream_id="chain",
        screen_within_batch=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    sq.awaitTermination()

    accepted, pairs = got[0]
    assert accepted == {3}
    assert {n for n, _ in pairs} == {5, 9}  # 5 reported, not just 9


def test_within_batch_screen_survives_replay(spark, tmp_path):
    """Replay of a committed batch (crash between the reference commit
    and the checkpoint ack) must reproduce the intra-batch removal
    records: the screen is deterministic, so a sink that overwrites by
    batch id keeps a COMPLETE matches set.  Regression: the screen was
    skipped on replay, so intra-dropped docs vanished from `matches`
    while still being excluded from `accepted`."""
    from tiledb_vector_search_spark.streaming import stream_crawl_loop

    words = [f"w{i}" for i in range(100)]
    hub = " ".join(words)
    a = " ".join(words[:87])
    b = " ".join(words[13:])
    seed = spark.createDataFrame(
        [(1000, "totally unrelated corpus text nothing shared here at all")],
        "doc_id long, text string",
    )
    uri = str(tmp_path / "ref")
    MinHashReference.build(spark, uri, seed)
    batch = spark.createDataFrame(
        [(3, a), (5, b), (9, hub)], "doc_id long, text string"
    )
    in_dir = tmp_path / "in"
    batch.coalesce(1).write.parquet(str(in_dir / "batch=0"))

    def run(ckpt):
        got = {}

        def sink(accepted, matches, batch_id):
            got[batch_id] = (
                {int(r.doc_id) for r in accepted.select("doc_id").collect()},
                {(r.new_id, r.ref_id) for r in matches.collect()},
            )

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "batch=*"))
        )
        sq = stream_crawl_loop(
            stream, uri, sink, threshold=0.8, stream_id="rply",
            screen_within_batch=True,
            checkpoint_dir=str(tmp_path / ckpt),
        )
        sq.awaitTermination()
        return got[0]

    first_accepted, first_pairs = run("ckpt1")
    # fresh checkpoint + same stream_id/batch id = a re-delivery of the
    # COMMITTED batch (key already in the artifact's ledger)
    replay_accepted, replay_pairs = run("ckpt2")
    assert replay_accepted == first_accepted == {3}
    # every intra-dropped doc is still reported on replay
    assert {n for n, _ in replay_pairs} >= {5, 9}
