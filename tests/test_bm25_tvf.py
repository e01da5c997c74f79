"""bm25_search SQL TVF: tokenizer + quantization parity with the engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.text import tokens
from tiledb_vector_search_spark.operators.retrieval import BM25Index
from tiledb_vector_search_spark.sql.bm25_tvf import (
    _py_tokens,
    register_bm25_search,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def bm25_uri(spark, docs, tmp_path_factory):
    uri = str(tmp_path_factory.mktemp("bm25tvf") / "idx")
    BM25Index.build(spark, uri, docs)
    return uri


def _sql(spark, uri, view, k=10):
    register_bm25_search(spark)
    return spark.sql(
        "SELECT * FROM bm25_search(TABLE("
        f"SELECT query_id, query_text FROM {view}), '{uri}', {k})"
    )


def test_py_tokens_mirrors_catalyst_tokens(spark, docs):
    """The TVF's Python tokenizer must agree with the Catalyst
    ``tokens()`` normalizer on the corpus AND on the hostile cases
    (unicode punctuation, NBSP — Java \\s is ASCII-only — tabs,
    İ-style case folding, empties)."""
    crafted = [
        "Héllo,  WORLD!  123",
        "tabs\tand\nnewlines",
        "nbsp\xa0here",
        "İstanbul",
        "",
        None,
        "---",
        "a  b   c",
    ]
    cdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(crafted)], "i long, text string"
    )
    for df in (
        docs.limit(300).select(F.col("doc_id").alias("i"), "text"),
        cdf,
    ):
        for r in df.select("i", tokens("text").alias("t"), "text").collect():
            spark_t = [x for x in r.t if x != ""] if r.t is not None else []
            assert spark_t == _py_tokens(r.text), (r.i, r.text)


def test_bm25_tvf_matches_dataframe_api(spark, docs, bm25_uri):
    """Score-for-score, rank-for-rank parity: the Python-side decimal
    quantization replays the engine's DECIMAL(18,9)/round-6 contract."""
    q = docs.where("doc_id < 10").select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 200).alias("query_text"),
    )
    q.createOrReplaceTempView("bm25_tvf_q")
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in _sql(spark, bm25_uri, "bm25_tvf_q").collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in BM25Index(spark, bm25_uri).query(q, k=10).collect()
    )
    assert got == want and len(got) > 0


def test_bm25_tvf_file_scheme_and_empty_queries(spark, docs, bm25_uri):
    q = docs.where("doc_id < 3").select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 100).alias("query_text"),
    )
    q.createOrReplaceTempView("bm25_tvf_q2")
    plain = sorted(map(tuple, _sql(spark, bm25_uri, "bm25_tvf_q2").collect()))
    via_uri = sorted(
        map(tuple, _sql(spark, f"file://{bm25_uri}", "bm25_tvf_q2").collect())
    )
    assert plain == via_uri and len(plain) == 30
    # a query that normalizes to nothing yields no rows, not an error
    spark.createDataFrame(
        [(0, "!!! ---")], "query_id long, query_text string"
    ).createOrReplaceTempView("bm25_tvf_q3")
    assert _sql(spark, bm25_uri, "bm25_tvf_q3").count() == 0


def test_bm25_tvf_reads_grown_index_batches(spark, docs, tmp_path):
    """The SQL path resolves the SAME committed batch dirs as the
    DataFrame path: a grown index (add_documents batches) scores
    identically through the TVF, and an orphan (uncommitted) batch dir
    stays invisible to it."""
    import os
    import shutil

    uri = str(tmp_path / "grown_tvf")
    idx = BM25Index.build(spark, uri, docs.where("doc_id % 2 = 0"))
    idx.add_documents(docs.where("doc_id % 2 = 1"))
    # plant an ORPHAN batch (copy of the committed batch, not
    # meta-listed): doubled postings would double the scores if the
    # TVF globbed dirs (batch entries are "<ordinal>-<nonce>" strings)
    committed = idx.meta["batches"][0]
    shutil.copytree(
        os.path.join(uri, "postings_batches", f"batch={committed}"),
        os.path.join(uri, "postings_batches", "batch=99-deadbeef"),
    )
    shutil.copytree(
        os.path.join(uri, "term_stats_batches", f"batch={committed}"),
        os.path.join(uri, "term_stats_batches", "batch=99-deadbeef"),
    )
    queries = docs.where("doc_id < 8").select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 150).alias("query_text"),
    )
    queries.createOrReplaceTempView("grown_tvf_queries")
    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in _sql(spark, uri, "grown_tvf_queries")
        .orderBy("query_id", "rank")
        .collect()
    ]
    want = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in idx.query(queries, k=10).orderBy("query_id", "rank").collect()
    ]
    assert got == want and len(got) > 0


def test_bm25_tvf_respects_deletes_and_consolidation(spark, docs, tmp_path):
    """The SQL path must mirror the full DML surface: after
    remove_documents the TVF masks tombstoned docs and nets the negative
    df deltas (score-identical to BM25Index.query); after consolidate()
    it resolves the generation pointers."""
    uri = str(tmp_path / "dml")
    idx = BM25Index.build(spark, uri, docs.where("doc_id % 2 = 0"))
    idx.add_documents(docs.where("doc_id % 2 = 1"))
    idx.remove_documents(docs.where("doc_id % 4 = 3").select("doc_id"))

    qdf = docs.where("doc_id < 8").select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 150).alias("query_text"),
    )
    qdf.createOrReplaceTempView("dml_queries")

    def df_key():
        return [
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in idx.query(
                qdf, k=10
            ).orderBy("query_id", "rank").collect()
        ]

    def sql_key():
        return [
            (r.query_id, r.rank, r.doc_id, r.score)
            for r in _sql(spark, uri, "dml_queries")
            .orderBy("query_id", "rank")
            .collect()
        ]

    want = df_key()
    got = sql_key()
    assert got == want and len(got) > 0
    assert all(d % 4 != 3 for (_, _, d, _) in got)

    idx.consolidate()
    assert sql_key() == want  # generation pointers resolve identically


def test_tvf_refuses_string_keyed_index(spark, tmp_path):
    """The TVF's declared schema is doc_id long; a string-keyed index
    (first-class in the DataFrame API) gets a clear boundary error
    instead of an opaque pyarrow crash."""
    import pytest as _pytest

    from tiledb_vector_search_spark.operators.retrieval import BM25Index
    from tiledb_vector_search_spark.sql.bm25_tvf import search_bm25_files

    docs = spark.createDataFrame(
        [("u-1", "alpha beta"), ("u-2", "beta gamma")],
        "doc_id string, text string",
    )
    uri = str(tmp_path / "sbm")
    BM25Index.build(spark, uri, docs, id_col="doc_id", text_col="text")
    with _pytest.raises(ValueError, match="string"):
        search_bm25_files(uri, [1], ["beta"], k=5)
