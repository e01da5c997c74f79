"""BM25 postings artifact: build-once/query-many parity + plan posture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.operators.retrieval import (
    BM25Index,
    bm25_topk,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def queries(docs):
    return docs.where("doc_id < 10").select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 200).alias("query_text"),
    )


@pytest.fixture(scope="module")
def bm25_index(spark, docs, tmp_path_factory):
    uri = str(tmp_path_factory.mktemp("bm25") / "idx")
    return BM25Index.build(spark, uri, docs)


def test_artifact_matches_one_shot_exactly(spark, docs, queries, bm25_index):
    """Score-for-score, rank-for-rank identical results from the persisted
    artifact and the one-shot pipeline (shared quantized scoring tail)."""
    want = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_topk(docs, queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_index.query(queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_artifact_query_reads_only_postings(spark, bm25_index):
    """The query half touches the artifact, not the corpus: its physical
    plan scans the postings/term-stats parquet and nothing else, and the
    corpus-global stats are literals (no stats aggregate/cross-join).
    Queries are an in-memory frame so ANY parquet scan of the corpus
    would be the query path's doing."""
    mem_queries = spark.createDataFrame(
        [(0, "some words to look up"), (1, "another lexical query")],
        "query_id long, query_text string",
    )
    plan = (
        bm25_index.query(mem_queries, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "postings" in plan and "term_stats" in plan
    assert "documents.parquet" not in plan
    # the one-shot plan re-aggregates corpus stats; the artifact plan
    # must not (N and sum_dl are literals from the meta file)
    assert "BroadcastNestedLoopJoin" not in plan


def test_describe_reports_corpus_and_postings(spark, docs, bm25_index):
    d = bm25_index.describe()
    n = docs.count()
    assert d["n_docs"] == n and d["sum_dl"] > 0
    assert d["avg_doc_len"] == pytest.approx(d["sum_dl"] / n)
    assert 0 < d["vocab_size"] <= d["postings_rows"]


def test_add_documents_matches_fresh_build(spark, docs, queries, tmp_path):
    """Incremental add over a half corpus == fresh build over the whole
    corpus, score-for-score (stats deltas + append-only term_stats sum
    to the same postings state)."""
    half_a = docs.where("doc_id % 2 = 0")
    half_b = docs.where("doc_id % 2 = 1")
    inc = BM25Index.build(spark, str(tmp_path / "inc"), half_a)
    inc.add_documents(half_b)
    full = BM25Index.build(spark, str(tmp_path / "full"), docs)
    assert inc.n_docs == full.n_docs and inc.sum_dl == full.sum_dl

    def key(idx):
        return [
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in idx.query(queries, k=10)
            .orderBy("query_id", "rank")
            .collect()
        ]

    assert key(inc) == key(full)
    # reopening by uri sees the bumped stats
    assert BM25Index(spark, inc.uri).n_docs == full.n_docs


def test_artifact_meta_and_reopen(spark, docs, bm25_index, queries):
    """Reopening by uri reads the committed meta; stats match the corpus."""
    reopened = BM25Index(spark, bm25_index.uri)
    n = docs.count()
    assert reopened.n_docs == n
    assert reopened.sum_dl > 0
    got = reopened.query(queries, k=3)
    assert got.count() == 10 * 3


def test_add_documents_crash_atomic(spark, docs, queries, tmp_path, monkeypatch):
    """VERDICT r5 #3: a crash between the postings append and the
    term_stats append must leave the index byte-identical to before the
    call (staged batch dirs are invisible until the meta flip); recovery
    (retrying the add) equals a fresh build over the union."""
    import posixpath

    half_a = docs.where("doc_id % 2 = 0")
    half_b = docs.where("doc_id % 2 = 1")
    idx = BM25Index.build(spark, str(tmp_path / "crash"), half_a)
    before = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in idx.query(queries, k=10).orderBy("query_id", "rank").collect()
    ]
    before_meta = dict(idx.meta)

    # crash AFTER the postings batch write, BEFORE term_stats/meta: the
    # worst window — postings rows exist whose terms have no df rows
    import pyspark.sql.readwriter as RW

    real_parquet = RW.DataFrameWriter.parquet
    calls = {"n": 0}

    def exploding_parquet(self, path, *a, **kw):
        out = real_parquet(self, path, *a, **kw)
        if "postings_batches" in path:
            calls["n"] += 1
            raise RuntimeError("injected crash after postings append")
        return out

    monkeypatch.setattr(RW.DataFrameWriter, "parquet", exploding_parquet)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.add_documents(half_b)
    monkeypatch.setattr(RW.DataFrameWriter, "parquet", real_parquet)
    assert calls["n"] == 1

    # pre-crash index unchanged: same meta, same scores, no silent drops
    reopened = BM25Index(spark, idx.uri)
    assert dict(reopened.meta) == before_meta
    after_crash = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in reopened.query(queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert after_crash == before

    # recovery: retry the add; scores == fresh build over the union
    reopened.add_documents(half_b)
    full = BM25Index.build(spark, str(tmp_path / "full"), docs)
    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in reopened.query(queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in full.query(queries, k=10).orderBy("query_id", "rank").collect()
    ]
    assert got == want
    assert reopened.n_docs == full.n_docs and reopened.sum_dl == full.sum_dl


def test_describe_single_batch_uses_footer_count(spark, bm25_index, docs, tmp_path):
    """VERDICT r5 #4: on a never-grown index, vocab_size comes from a
    plain row count (no term-keyed shuffle in the plan); a grown index
    pays the distinct and still reports the exact deduped vocab."""
    d = bm25_index.describe()
    # never-grown: term_stats has one row per term, count == vocab
    ts = spark.read.parquet(f"{bm25_index.uri}/term_stats")
    assert d["vocab_size"] == ts.count()
    assert ts.select("term").distinct().count() == d["vocab_size"]

    grown = BM25Index.build(
        spark, str(tmp_path / "grown"), docs.where("doc_id % 2 = 0")
    )
    grown.add_documents(docs.where("doc_id % 2 = 1"))
    full = BM25Index.build(spark, str(tmp_path / "fullv"), docs)
    assert grown.describe()["vocab_size"] == full.describe()["vocab_size"]


def test_legacy_flat_layout_still_reads(spark, docs, queries, tmp_path):
    """A pre-batch artifact (meta WITHOUT the 'batches' key, flat
    postings/term_stats only) must keep querying identically — the
    batch-dir resolution treats missing 'batches' as empty."""
    import json
    import os

    uri = str(tmp_path / "legacy")
    idx = BM25Index.build(spark, uri, docs)
    want = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in idx.query(queries, k=5).orderBy("query_id", "rank").collect()
    ]
    # strip the batches key, simulating an artifact written before r6
    meta_path = os.path.join(uri, "_bm25_meta.json")
    meta = json.loads(open(meta_path).read())
    del meta["batches"]
    open(meta_path, "w").write(json.dumps(meta))
    # drop Hadoop LocalFS's checksum sidecar (the out-of-band rewrite
    # invalidated it)
    crc = os.path.join(uri, "._bm25_meta.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    legacy = BM25Index(spark, uri)
    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in legacy.query(queries, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want
    d = legacy.describe()
    assert d["n_docs"] == idx.n_docs and d["vocab_size"] > 0


# --- DML: remove_documents + consolidate (the lexical DML triple) ------------


def _key(idx, queries, k=10):
    return [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in idx.query(queries, k=k).orderBy("query_id", "rank").collect()
    ]


def test_remove_documents_matches_fresh_build(spark, docs, queries, tmp_path):
    """Deleting half the corpus == fresh build over the survivors,
    score-for-score (tombstones mask postings; negative df deltas and
    the meta stat decrements make idf/avgdl exact, not approximate)."""
    survivors = docs.where("doc_id % 2 = 0")
    doomed_ids = docs.where("doc_id % 2 = 1").select("doc_id")
    idx = BM25Index.build(spark, str(tmp_path / "del"), docs)
    idx.remove_documents(doomed_ids)
    fresh = BM25Index.build(spark, str(tmp_path / "fresh"), survivors)
    assert idx.n_docs == fresh.n_docs and idx.sum_dl == fresh.sum_dl
    assert _key(idx, queries) == _key(fresh, queries)
    # reopening by uri sees the committed delete
    reopened = BM25Index(spark, idx.uri)
    assert reopened.n_docs == fresh.n_docs
    assert _key(reopened, queries) == _key(fresh, queries)
    # no deleted doc ever surfaces
    got_docs = {
        r.doc_id for r in idx.query(queries, k=50).select("doc_id").collect()
    }
    assert got_docs and all(d % 2 == 0 for d in got_docs)


def test_remove_documents_idempotent_and_unknown_ids_noop(
    spark, docs, tmp_path
):
    """Removing already-removed or never-present ids must not move the
    corpus stats (stats only decrement for docs whose postings exist and
    are not yet tombstoned)."""
    idx = BM25Index.build(spark, str(tmp_path / "noop"), docs)
    some = docs.where("doc_id < 5").select("doc_id")
    idx.remove_documents(some)
    meta_after = dict(idx.meta)
    # double delete: no stats drift, no new batch
    idx.remove_documents(some)
    assert dict(idx.meta) == meta_after
    # unknown ids: no-op
    unknown = spark.range(10_000_000, 10_000_050).select(
        F.col("id").alias("doc_id")
    )
    idx.remove_documents(unknown)
    assert dict(idx.meta) == meta_after


def test_consolidate_scores_identical_and_zero_debt(
    spark, docs, queries, tmp_path
):
    """The fold: build half → add half → delete a quarter → consolidate.
    Scores byte-identical before/after; describe() shows zero batch
    debt; the old generation + batch dirs are gone; reopening resolves
    the generation pointers."""
    import os

    uri = str(tmp_path / "fold")
    idx = BM25Index.build(spark, uri, docs.where("doc_id % 2 = 0"))
    idx.add_documents(docs.where("doc_id % 2 = 1"))
    idx.remove_documents(docs.where("doc_id % 4 = 3").select("doc_id"))
    before = _key(idx, queries)
    d0 = idx.describe()
    assert d0["batch_debt"] == 2  # one add batch + one delete batch

    idx.consolidate()
    assert _key(idx, queries) == before
    d1 = idx.describe()
    assert d1["batch_debt"] == 0
    assert d1["n_docs"] == d0["n_docs"] and d1["sum_dl"] == d0["sum_dl"]
    assert d1["vocab_size"] == d0["vocab_size"]
    # postings_rows drops the tombstoned rows physically after the fold
    assert d1["postings_rows"] == d0["postings_rows"]
    # old dirs garbage-collected; new generation dirs live
    assert not os.path.exists(os.path.join(uri, "postings"))
    assert not os.path.exists(os.path.join(uri, "postings_batches/batch=1"))
    assert not os.path.exists(os.path.join(uri, "tombstones/batch=2"))
    assert os.path.exists(os.path.join(uri, "postings_gen1"))
    assert os.path.exists(os.path.join(uri, "term_stats_gen1"))
    # reopen through the pointer; a second consolidate is a no-op
    reopened = BM25Index(spark, uri)
    assert _key(reopened, queries) == before
    reopened.consolidate()
    assert _key(reopened, queries) == before
    # post-fold scores still equal a fresh build over the survivors
    fresh = BM25Index.build(
        spark, str(tmp_path / "fresh"), docs.where("doc_id % 4 != 3")
    )
    assert _key(reopened, queries) == _key(fresh, queries)
    # and the index keeps accepting DML after the fold
    reopened.remove_documents(
        docs.where("doc_id % 4 = 2").select("doc_id")
    )
    fresh2 = BM25Index.build(
        spark, str(tmp_path / "fresh2"), docs.where("doc_id % 4 IN (0, 1)")
    )
    assert _key(reopened, queries) == _key(fresh2, queries)


def test_consolidate_crash_atomic(spark, docs, queries, tmp_path, monkeypatch):
    """A crash between the gen-dir writes and the meta flip leaves the
    index byte-identical (readers never resolve unreferenced gen dirs);
    the retry completes the fold."""
    import pyspark.sql.readwriter as RW

    idx = BM25Index.build(
        spark, str(tmp_path / "cfold"), docs.where("doc_id % 2 = 0")
    )
    idx.add_documents(docs.where("doc_id % 2 = 1"))
    idx.remove_documents(docs.where("doc_id % 4 = 3").select("doc_id"))
    before = _key(idx, queries)
    before_meta = dict(idx.meta)

    real_parquet = RW.DataFrameWriter.parquet

    def exploding_parquet(self, path, *a, **kw):
        out = real_parquet(self, path, *a, **kw)
        if "postings_gen" in path:
            raise RuntimeError("injected crash after gen postings write")
        return out

    monkeypatch.setattr(RW.DataFrameWriter, "parquet", exploding_parquet)
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.consolidate()
    monkeypatch.setattr(RW.DataFrameWriter, "parquet", real_parquet)

    reopened = BM25Index(spark, idx.uri)
    assert dict(reopened.meta) == before_meta
    assert _key(reopened, queries) == before
    # retry completes; orphan gen dirs from the crash are overwritten
    reopened.consolidate()
    assert _key(reopened, queries) == before
    assert reopened.describe()["batch_debt"] == 0


def test_kernel_strategy_matches_join_exactly(spark, docs, queries, bm25_index):
    """The doc-partitioned int64 kernel must be BIT-IDENTICAL to the
    join/aggregate plan — same scores, ranks, tie-breaks — on the plain
    index AND on one with add/delete batch debt."""
    want = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_index.query(queries, k=10, strategy="join")
        .orderBy("query_id", "rank")
        .collect()
    ]
    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_index.query(queries, k=10, strategy="kernel")
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got == want and len(got) > 0
    # auto picks the kernel for this integral-id batch
    auto = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in bm25_index.query(queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert auto == want


def test_kernel_strategy_with_dml_debt(spark, docs, queries, tmp_path):
    idx = BM25Index.build(spark, str(tmp_path / "kdml"), docs.where("doc_id % 2 = 0"))
    idx.add_documents(docs.where("doc_id % 2 = 1"))
    idx.remove_documents(docs.where("doc_id % 4 = 3").select("doc_id"))
    assert _key(idx, queries) == [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in idx.query(queries, k=10, strategy="join")
        .orderBy("query_id", "rank")
        .collect()
    ]


def test_readd_tombstoned_id_raises_until_consolidate(
    spark, docs, tmp_path
):
    """Re-adding a deleted id before consolidate() would be silently
    masked by the id-keyed tombstone filter — it must raise instead.
    After consolidate() (tombstones physically folded away) the id is
    free again and scores match a fresh build."""
    idx = BM25Index.build(
        spark, str(tmp_path / "readd"), docs.where("doc_id < 40")
    )
    idx.remove_documents(spark.createDataFrame([(7,)], "doc_id long"))
    readd = docs.where("doc_id = 7")
    with pytest.raises(ValueError, match="tombstoned"):
        idx.add_documents(readd)
    idx.consolidate()
    idx.add_documents(readd)  # id free after the fold
    q = docs.where("doc_id = 7").select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 120).alias("query_text"),
    )
    fresh = BM25Index.build(
        spark, str(tmp_path / "readd_fresh"), docs.where("doc_id < 40")
    )
    got = [
        (r.rank, r.doc_id, r.score)
        for r in idx.query(q, k=5).orderBy("rank").collect()
    ]
    want = [
        (r.rank, r.doc_id, r.score)
        for r in fresh.query(q, k=5).orderBy("rank").collect()
    ]
    assert got == want
    assert 7 in {d for _rank, d, _s in got}  # the re-added doc is live


def test_auto_strategy_size_probe_is_bounded(
    spark, docs, queries, bm25_index, monkeypatch
):
    """`auto` must decide kernel-vs-join from a BOUNDED distinct-count
    probe, never by collecting the query-term pairs first: with the cap
    patched below the batch size, auto falls back to the join plan (and
    still matches it), while strategy='kernel' raises the cap error."""
    import tiledb_vector_search_spark.operators.retrieval as r

    monkeypatch.setattr(r, "BM25_KERNEL_MAX_NQ", 2)
    want = [
        (q.query_id, q.rank, q.doc_id, q.score)
        for q in bm25_index.query(queries, k=10, strategy="join")
        .orderBy("query_id", "rank")
        .collect()
    ]
    auto = [
        (q.query_id, q.rank, q.doc_id, q.score)
        for q in bm25_index.query(queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert auto == want
    with pytest.raises(ValueError, match="caps at 2"):
        bm25_index.query(queries, k=10, strategy="kernel").collect()


def test_auto_strategy_term_dimension_probe(
    spark, docs, queries, bm25_index, monkeypatch
):
    """The kernel's broadcast indicator matrix and dense per-task planes
    grow with the batch VOCABULARY, not just the query count — a wide-
    vocab integral-id batch under `auto` must fall back to the join plan
    (silently, with identical results) before any driver collect, and an
    explicit strategy='kernel' must raise.  Cap patched below the batch
    vocabulary so the sf0.001 queries trip it."""
    import tiledb_vector_search_spark.operators.retrieval as r

    monkeypatch.setattr(r, "BM25_KERNEL_MAX_TERMS", 8)
    want = [
        (q.query_id, q.rank, q.doc_id, q.score)
        for q in bm25_index.query(queries, k=10, strategy="join")
        .orderBy("query_id", "rank")
        .collect()
    ]
    auto = [
        (q.query_id, q.rank, q.doc_id, q.score)
        for q in bm25_index.query(queries, k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert auto == want
    with pytest.raises(ValueError, match="distinct query terms"):
        bm25_index.query(queries, k=10, strategy="kernel").collect()


def test_kernel_preserves_query_id_dtype(spark, docs, bm25_index):
    """Under strategy='auto' the result schema must not depend on which
    physical strategy won: an int query-id column comes back int from
    BOTH the kernel and the join plan (the kernel's Arrow schema is
    long internally and must cast back)."""
    int_queries = (
        docs.where("doc_id < 5")
        .select(
            F.col("doc_id").cast("int").alias("query_id"),
            F.substring("text", 1, 120).alias("query_text"),
        )
    )
    kern = bm25_index.query(int_queries, k=5, strategy="kernel")
    join = bm25_index.query(int_queries, k=5, strategy="join")
    assert dict(kern.dtypes) == dict(join.dtypes)
    assert dict(kern.dtypes)["query_id"] == "int"
    got = [
        (q.query_id, q.rank, q.doc_id, q.score)
        for q in kern.orderBy("query_id", "rank").collect()
    ]
    want = [
        (q.query_id, q.rank, q.doc_id, q.score)
        for q in join.orderBy("query_id", "rank").collect()
    ]
    assert got == want and len(got) > 0


def test_kernel_id_dtype_gates(spark, docs, queries, tmp_path):
    """Both id axes gate the kernel: the plan rides an int64 Arrow
    schema, so (a) an INT doc-id index keeps its int schema through the
    kernel (the cast-back), (b) a string doc-id index makes `auto`
    quietly keep the join plan and the explicit kernel raise, and (c) a
    fractional query id makes the explicit kernel raise instead of
    silently truncate-merging queries."""
    # (a) int doc ids: kernel == join, including the result schema
    int_docs = docs.select(F.col("doc_id").cast("int").alias("doc_id"), "text")
    idx_int = BM25Index.build(spark, str(tmp_path / "int_ids"), int_docs)
    join_df = idx_int.query(queries, k=5, strategy="join")
    kern_df = idx_int.query(queries, k=5, strategy="kernel")
    assert dict(join_df.dtypes) == dict(kern_df.dtypes)
    assert dict(kern_df.dtypes)["doc_id"] == "int"
    want = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in join_df.orderBy("query_id", "rank").collect()
    ]
    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in kern_df.orderBy("query_id", "rank").collect()
    ]
    assert got == want and len(got) > 0

    # (b) string doc ids: auto stays on the join plan (no task crash)
    str_docs = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"), "text"
    )
    idx_str = BM25Index.build(spark, str(tmp_path / "str_ids"), str_docs)
    rows = idx_str.query(queries, k=5).orderBy("query_id", "rank").collect()
    assert len(rows) > 0 and rows[0].doc_id.startswith("doc-")
    with pytest.raises(ValueError, match="integral doc-id"):
        idx_str.query(queries, k=5, strategy="kernel")

    # (c) fractional query ids: explicit kernel raises, never merges
    frac_q = queries.select(
        (F.col("query_id") + 0.5).alias("query_id"), "query_text"
    )
    idx = BM25Index.build(spark, str(tmp_path / "frac"), docs)
    with pytest.raises(ValueError, match="integral query_id"):
        idx.query(frac_q, k=5, strategy="kernel")
    # auto on the fractional batch keeps the join plan and preserves ids
    frac_rows = idx.query(frac_q, k=5).collect()
    assert {r.query_id for r in frac_rows} <= {i + 0.5 for i in range(10)}


def test_remove_documents_rejects_unparseable_ids(spark, docs, tmp_path):
    """ADVICE r9: on a bigint-keyed index, a string ids frame whose
    values don't parse casts to NULL and the delete silently NO-OPs —
    the same data-retention class as the string-keyed bug fixed in r9,
    from the other direction.  Must raise; numeric strings (lossless
    casts) still work."""
    idx = BM25Index.build(spark, str(tmp_path / "bi"), docs)
    n0 = idx.n_docs
    bad = spark.createDataFrame([("doc-1",), ("doc-2",)], "doc_id string")
    with pytest.raises(TypeError, match="do not convert"):
        idx.remove_documents(bad)
    assert BM25Index(spark, idx.uri).n_docs == n0  # nothing half-applied
    # lossless string→bigint ids are accepted (a convenience, not a trap)
    ok = spark.createDataFrame([("1",), ("3",)], "doc_id string")
    idx.remove_documents(ok)
    assert BM25Index(spark, idx.uri).n_docs == n0 - 2
