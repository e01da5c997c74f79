"""Sequence packing: budget respected, oversize singletons, determinism,
fill-rate stats, one-shuffle plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def test_budget_respected_and_total_preserved(spark, docs):
    packed = pack_sequences(docs, max_tokens=256, num_shards=4)
    per_seq = packed.groupBy("shard", "seq").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("docs")
    )
    # a multi-doc sequence never exceeds the budget; only singleton
    # sequences may (oversize documents)
    bad = per_seq.where((F.col("tot") > 256) & (F.col("docs") > 1)).count()
    assert bad == 0
    # every document packed exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_oversize_doc_is_singleton_and_neighbors_unharmed(spark):
    rows = [(1, 10), (2, 999), (3, 10), (4, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(
        df, max_tokens=100, num_shards=1, token_count_col=F.col("n_tokens")
    ).collect()
    seq = {r.doc_id: r.seq for r in packed}
    # doc 2 (999 > 100) sits alone; 1 before it, 3+4 packed together after
    assert seq[1] != seq[2] and seq[2] != seq[3]
    assert seq[3] == seq[4]
    by_seq = {}
    for r in packed:
        by_seq.setdefault(r.seq, []).append(r.doc_id)
    assert by_seq[seq[2]] == [2]


def test_deterministic_across_runs(spark, docs):
    a = pack_sequences(docs, max_tokens=512, num_shards=4)
    b = pack_sequences(docs, max_tokens=512, num_shards=4)
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(a) == rows(b)


def test_packing_stats(spark):
    rows = [(i, 60) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(
        df, max_tokens=100, num_shards=1, token_count_col=F.col("n_tokens")
    )
    st = packing_stats(packed, 100).collect()[0]
    # 60-token docs: one per sequence (two would be 120 > 100)
    assert st.sequences == 10 and st.docs == 10 and st.tokens == 600
    assert abs(st.fill_rate - 0.6) < 1e-9
    assert st.oversize_sequences == 0


def test_one_shuffle_plan(spark, docs):
    packed = pack_sequences(docs, max_tokens=512, num_shards=8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        packed.explain("formatted")
    plan = buf.getvalue()
    # exactly one Exchange node (formatted mode prints each node in the
    # tree and again in the detail section): the hash partition on shard
    # feeding the per-shard greedy scan
    assert plan.count("Exchange (") == 1
    # the text column is read (token counting) but never SHUFFLED — the
    # Exchange input is the narrow (shard, doc_id, n_tokens) projection
    exchange_detail = plan.split(") Exchange")[1].split("\n\n")[0]
    assert "text#" not in exchange_detail


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, max_tokens=0, num_shards=2)
    with pytest.raises(ValueError, match="num_shards"):
        pack_sequences(docs, max_tokens=10, num_shards=0)


# --- differential property test ----------------------------------------------


def _py_greedy(pairs, cap):
    """Reference greedy packer: (doc_id, n_tokens) sorted by id."""
    out, seq, acc = {}, -1, 0
    for doc_id, n in sorted(pairs):
        if seq < 0 or acc + n > cap:
            seq, acc = seq + 1, n
        else:
            acc += n
        out[doc_id] = seq
    return out


def test_differential_random_corpora(spark):
    """Randomized (token_count, cap) corpora: the distributed packer
    equals the sequential reference greedy per shard, including oversize
    docs and cap-boundary exact fits."""
    import random

    rng = random.Random(7)
    for trial in range(5):
        cap = rng.choice([16, 64, 257])
        n = rng.randrange(1, 120)
        rows = [
            # include exact-fit (== cap), tiny, and oversize counts
            (i, rng.choice([1, 2, cap - 1, cap, cap + 1, rng.randrange(1, 3 * cap)]))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        packed = pack_sequences(
            df, max_tokens=cap, num_shards=3, token_count_col=F.col("n_tokens")
        ).collect()
        by_shard = {}
        for r in packed:
            by_shard.setdefault(r.shard, []).append((r.doc_id, r.n_tokens))
        assert sum(len(v) for v in by_shard.values()) == n
        got = {r.doc_id: (r.shard, r.seq) for r in packed}
        for shard, pairs in by_shard.items():
            want = _py_greedy(pairs, cap)
            for doc_id, seq in want.items():
                assert got[doc_id] == (shard, seq), (trial, cap, doc_id)
