"""Id-type contracts at the engine's user boundaries (wave 6).

With ANSI mode off (the Spark default) ``cast("long")`` on a string id
column yields NULL and on a fractional one TRUNCATES — both silent, both
catastrophic for an id: rows merge under one key, joins match nothing,
deletes no-op.  Wave 2 closed this for the BM25 kernel gates; this file
pins the rest of the surface:

- vector-index boundaries (ingest / update_batch / merge_batch /
  allowed_ids / query validation / streaming) RAISE on non-integral ids;
- BM25 ``remove_documents`` and the ``add_documents`` tombstone guard
  work on STRING-keyed indexes (previously: silent no-op / silent
  re-add);
- ``pack_sequences`` and ``semantic_dedup`` accept string ids first-class
  (same contract as the other dedup operators) and raise on fractional;
- ``hash_split({})`` raises instead of crashing with AttributeError.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _vecs(spark, id_type="double"):
    rows = [(float(i) + 0.5, [float(i), 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, f"external_id {id_type}, vector array<float>")
    return df


# --------------------------------------------------------------------------
# vector-index boundaries raise on string / fractional ids
# --------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["flat", "ivf_flat", "ivf_pq", "vamana"])
def test_ingest_rejects_fractional_ids(spark, tmp_path, kind):
    from tiledb_vector_search_spark import ingest

    with pytest.raises(TypeError, match="id column"):
        ingest(
            spark,
            str(tmp_path / kind),
            _vecs(spark),
            index_type=kind.upper(),
        )


def test_ingest_rejects_string_ids(spark, tmp_path):
    from tiledb_vector_search_spark import ingest

    df = spark.createDataFrame(
        [("a", [0.0, 1.0]), ("b", [1.0, 0.0])],
        "external_id string, vector array<float>",
    )
    with pytest.raises(TypeError, match="string"):
        ingest(spark, str(tmp_path / "s"), df, index_type="FLAT")


@pytest.fixture(scope="module")
def flat_index(spark, tmp_path_factory):
    from tiledb_vector_search_spark import ingest

    uri = str(tmp_path_factory.mktemp("idc") / "flat")
    src = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(8)],
        "external_id long, vector array<float>",
    )
    return ingest(spark, uri, src, index_type="FLAT")


def test_update_batch_rejects_bad_id_frame(spark, flat_index):
    bad = spark.createDataFrame(
        [(1.5, [9.0, 9.0])], "external_id double, vector array<float>"
    )
    with pytest.raises(TypeError, match="update_batch"):
        flat_index.update_batch(bad)


def test_merge_batch_rejects_bad_id_frame(spark, flat_index):
    bad = spark.createDataFrame(
        [("x", [9.0, 9.0], False)],
        "external_id string, vector array<float>, is_delete boolean",
    )
    with pytest.raises(TypeError, match="merge_batch"):
        flat_index.merge_batch(bad)


def test_query_rejects_fractional_query_ids(spark, flat_index):
    q = spark.createDataFrame(
        [(0.5, [0.0, 0.0])], "query_id double, vector array<float>"
    )
    with pytest.raises(TypeError, match="query_id"):
        flat_index.query(q, k=2)


def test_allowed_ids_rejects_string_frame(spark, flat_index):
    q = spark.createDataFrame(
        [(0, [0.0, 0.0])], "query_id long, vector array<float>"
    )
    allowed = spark.createDataFrame([("3",)], "external_id string")
    with pytest.raises(TypeError, match="allowed_ids"):
        flat_index.query(q, k=2, allowed_ids=allowed)


def test_int32_ids_still_pass(spark, tmp_path):
    """The check is type-level: any integral width keeps working."""
    from tiledb_vector_search_spark import ingest

    src = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)],
        "external_id int, vector array<float>",
    )
    idx = ingest(spark, str(tmp_path / "i32"), src, index_type="FLAT")
    q = spark.createDataFrame(
        [(0, [0.0, 0.0])], "query_id int, vector array<float>"
    )
    out = idx.query(q, k=1).collect()
    assert [int(r["external_id"]) for r in out] == [0]


# --------------------------------------------------------------------------
# BM25 string-keyed DML: remove + tombstone guard actually fire
# --------------------------------------------------------------------------


def _string_bm25(spark, uri):
    from tiledb_vector_search_spark.operators.retrieval import BM25Index

    docs = spark.createDataFrame(
        [
            ("doc-a", "spark shuffles data between stages"),
            ("doc-b", "parquet stores columns together"),
            ("doc-c", "spark reads parquet fast"),
        ],
        "doc_id string, text string",
    )
    return BM25Index.build(spark, uri, docs, id_col="doc_id", text_col="text")


def test_bm25_remove_works_on_string_ids(spark, tmp_path):
    idx = _string_bm25(spark, str(tmp_path / "bm"))
    n0, sd0 = idx.n_docs, idx.sum_dl
    ids = spark.createDataFrame([("doc-b",)], "doc_id string")
    idx.remove_documents(ids)
    # the old cast("long") nulled every id and the delete silently
    # no-op'd; now stats move and the doc stops matching
    assert idx.n_docs == n0 - 1
    assert idx.sum_dl < sd0
    q = spark.createDataFrame([(1, "columns together")], "qid long, qt string")
    hits = idx.query(q, k=5, query_id_col="qid", query_text_col="qt").collect()
    assert all(r["doc_id"] != "doc-b" for r in hits)
    # and the surviving docs still rank
    q2 = spark.createDataFrame([(1, "spark parquet")], "qid long, qt string")
    got = {
        r["doc_id"]
        for r in idx.query(q2, k=5, query_id_col="qid", query_text_col="qt").collect()
    }
    assert "doc-c" in got


def test_bm25_tombstone_guard_fires_on_string_ids(spark, tmp_path):
    idx = _string_bm25(spark, str(tmp_path / "bm2"))
    idx.remove_documents(spark.createDataFrame([("doc-a",)], "doc_id string"))
    re_add = spark.createDataFrame(
        [("doc-a", "spark again")], "doc_id string, text string"
    )
    # previously the long-cast semi-join missed the string tombstone and
    # the doc silently re-entered masked by the delete filter
    with pytest.raises(ValueError, match="tombstoned"):
        idx.add_documents(re_add)


def test_bm25_remove_long_ids_unchanged(spark, tmp_path):
    from tiledb_vector_search_spark.operators.retrieval import BM25Index

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    idx = BM25Index.build(
        spark, str(tmp_path / "bml"), docs, id_col="doc_id", text_col="text"
    )
    idx.remove_documents(spark.createDataFrame([(2,)], "doc_id long"))
    assert idx.n_docs == 2
    q = spark.createDataFrame([(1, "beta")], "qid long, qt string")
    hits = idx.query(q, k=5, query_id_col="qid", query_text_col="qt").collect()
    assert {int(r["doc_id"]) for r in hits} == {1}


# --------------------------------------------------------------------------
# pack_sequences / semantic_dedup: string ids first-class
# --------------------------------------------------------------------------


def test_pack_sequences_string_ids(spark):
    from tiledb_vector_search_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(f"url-{i:02d}", "w " * (i + 1)) for i in range(10)],
        "doc_id string, text string",
    )
    out = pack_sequences(docs, max_tokens=6, num_shards=2).collect()
    assert len(out) == 10
    assert all(isinstance(r["doc_id"], str) for r in out)
    # within a shard, ids ascend across the seq stream and budgets hold
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        tot: dict[int, int] = {}
        for r in rows:
            tot[r["seq"]] = tot.get(r["seq"], 0) + r["n_tokens"]
        for s, t in tot.items():
            n_docs = sum(1 for r in rows if r["seq"] == s)
            assert t <= 6 or n_docs == 1  # oversize singleton
        # greedy over ascending ids: seq numbers never decrease
        assert [r["seq"] for r in rows] == sorted(r["seq"] for r in rows)


def test_pack_sequences_fractional_ids_raise(spark):
    from tiledb_vector_search_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1.5, "a b c")], "doc_id double, text string"
    )
    with pytest.raises(TypeError, match="fractional"):
        pack_sequences(docs, max_tokens=4, num_shards=1)


def test_semantic_dedup_string_ids(spark):
    from tiledb_vector_search_spark.operators.dedup import semantic_dedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=(3, 4))
    rows = []
    for gi, v in enumerate(base):
        for c in range(2):  # two near-copies per group
            w = v + rng.normal(scale=1e-4, size=4)
            rows.append((f"doc-{gi}-{c}", [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = semantic_dedup(
        df, num_clusters=2, threshold=0.99, keep="min_id"
    ).collect()
    assert len(out) == 6
    assert all(isinstance(r["vec_id"], str) for r in out)
    groups: dict[str, list] = {}
    for r in out:
        groups.setdefault(r["group_id"], []).append(r)
    # each near-copy pair groups together with exactly one keeper = min id
    for gid, members in groups.items():
        assert gid == min(m["vec_id"] for m in members)
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1 and keepers[0]["vec_id"] == gid
    assert len(groups) == 3


def test_hash_split_empty_raises(spark):
    from tiledb_vector_search_spark.operators.sampling import hash_split

    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one"):
        hash_split(df, "id", {})


def test_stream_updates_rejects_bad_id_type(spark, tmp_path, flat_index):
    """The streaming boundary raises inside the batch fn — surface check
    at plan-build time via a direct call of the same validator."""
    from tiledb_vector_search_spark.schemas import integral_id_col

    bad = spark.createDataFrame([("x", [0.0])], "id string, vector array<float>")
    with pytest.raises(TypeError, match="stream"):
        integral_id_col(bad, "id", "stream_updates_to_index")


def test_dataframe_object_reader_rejects_fractional_ids(spark):
    """The embedding kernels decode ids with to_numpy(dtype=int64),
    which truncates a float id column silently."""
    from tiledb_vector_search_spark.objects.readers import (
        DataFrameObjectReader,
    )

    df = spark.createDataFrame(
        [(1.5, "text a")], "external_id double, text string"
    )
    reader = DataFrameObjectReader(df=df, payload_cols=["text"])
    with pytest.raises(TypeError, match="DataFrameObjectReader"):
        reader.read_objects(spark)
