"""Deterministic hash sampling/splitting: stability and disjointness."""

from __future__ import annotations

import pytest

from tiledb_vector_search_spark.operators.sampling import (
    hash_sample,
    hash_split,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")


@pytest.fixture(scope="module")
def docs_with_source(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )


def test_sample_stable_under_repartition(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(7), "doc_id", 0.3).collect()
    }
    assert a == b
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # ~fraction, not exact


def test_split_disjoint_and_total(spark, docs):
    out = hash_split(docs, "doc_id", {"train": 0.7, "test": 0.2}).collect()
    by_split: dict[str, set] = {}
    for r in out:
        by_split.setdefault(r.split, set()).add(r.doc_id)
    assert set(by_split) <= {"train", "test", "holdout"}
    total = sum(len(v) for v in by_split.values())
    assert total == docs.count()  # every row labeled exactly once
    # different salts decorrelate membership
    other = hash_split(docs, "doc_id", {"train": 0.7, "test": 0.2}, salt="x")
    tr2 = {r.doc_id for r in other.collect() if r.split == "train"}
    assert tr2 != by_split.get("train")


def test_sample_fraction_validation(spark, docs):
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, "doc_id", 0.0)
    with pytest.raises(ValueError, match="sum"):
        hash_split(docs, "doc_id", {"a": 0.8, "b": 0.4})


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key → Catalyst plans the join with
    zero Exchange on either side (the write-time-shuffle contract)."""
    from tiledb_vector_search_spark.sources import read_bucketed, write_bucketed

    a = spark.range(0, 1000).withColumnRenamed("id", "k")
    b = a.selectExpr("k", "k * 2 AS v")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(a, "bkt_a", "k", 8, path=str(tmp_path / "a"))
        write_bucketed(b, "bkt_b", "k", 8, path=str(tmp_path / "b"))
        joined = read_bucketed(spark, "bkt_a").join(
            read_bucketed(spark, "bkt_b"), "k"
        )
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_equivalent(spark):
    """salted_join ≡ plain join on a hot-key fixture, inner and left."""
    from tiledb_vector_search_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(5000)] + [(k, 0) for k in range(2, 30)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(k, f"v{k}") for k in range(0, 20)], "k long, attr string"
    )
    for how in ("inner", "left"):
        plain = {
            (r.k, r.payload, r.attr)
            for r in big.join(dim, "k", how).collect()
        }
        salted = {
            (r.k, r.payload, r.attr)
            for r in salted_join(big, dim, "k", how, salt=8).collect()
        }
        assert salted == plain
    import pytest

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, dim, "k", "right")


def test_stratified_sample_rates(spark, docs_with_source):
    from tiledb_vector_search_spark.operators.sampling import (
        stratified_hash_sample,
    )

    out = stratified_hash_sample(
        docs_with_source, "doc_id", "source", {"src0": 1.0}, default_fraction=0.0
    )
    rows = out.collect()
    # fraction 1.0 keeps every src0 doc; default 0.0 drops everything else
    src0_total = docs_with_source.where("source = 'src0'").count()
    assert len(rows) == src0_total > 0
    assert all(r.source == "src0" for r in rows)
    import pytest

    with pytest.raises(ValueError, match="fraction"):
        stratified_hash_sample(
            docs_with_source, "doc_id", "source", {"src0": 1.5}
        )
