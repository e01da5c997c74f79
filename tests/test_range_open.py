"""Range opens: ``timestamp=(start, end)`` (reference ``index.py:117-150``).

Two modes, split on whether the range covers the corpus from its
beginning:

- ``start`` past the first ingestion → UPDATES-ONLY: the handle's
  logical set is the update batches in ``[start, end]`` — "what changed
  in this window".  No base scan (reference ``query_base_array=False``);
  queries are the exact brute-force over the window's additions, the
  same plan the reference always uses for its updates overlay
  (``_query_additions``, ``index.py:353-366``).
- otherwise → fold-equivalent to an int open at ``end`` (the reference
  resolves to the FIRST base + every update through ``end``; the newest
  base ≤ end + its window is the same logical row set and stays
  readable after vacuum).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes import (
    FlatIndex,
    IVFFlatIndex,
    IVFPQIndex,
    VamanaIndex,
    open_index,
)

K = 5

V_A = [1.0] * 64
V_B = [2.0] * 64
V_C = [3.0] * 64


@pytest.fixture()
def source(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )


@pytest.fixture()
def queries(source):
    return source.where("external_id < 3").select(
        F.col("external_id").alias("query_id"), "vector"
    )


def _history(cls, spark, uri, source, **ingest_kw):
    """Base at 1000; updates at 1500 (two upserts), 2000 (delete one +
    re-upsert the other), 2500 (a third doc)."""
    idx = cls.ingest(spark, uri, source, timestamp=1000, **ingest_kw)
    idx.update_batch([(777_001, V_A), (777_002, V_B)], timestamp=1500)
    idx.delete(777_001, timestamp=2000)
    idx.update(777_002, V_C, timestamp=2000)
    idx.update(777_003, V_A, timestamp=2500)
    return idx


def _ids(idx, queries, k=K, **kw):
    return {int(r.external_id) for r in idx.query(queries, k, **kw).collect()}


def test_updates_only_window_is_what_changed(spark, tmp_path, source, queries):
    uri = str(tmp_path / "flat")
    _history(FlatIndex, spark, uri, source)
    # [1200, 2200]: 777_002 latest-in-window is V_C; 777_001 deleted in
    # window; 777_003 (2500) outside
    idx = open_index(spark, uri, timestamp=(1200, 2200))
    assert not idx.query_base_array
    assert idx.size() == 1
    got = idx.query(queries, K).collect()
    assert {int(r.external_id) for r in got} == {777_002}
    # last-writer-wins INSIDE the window: the 2000 re-upsert (V_C), not
    # the 1500 original (V_B)
    import numpy as np

    qmat = {int(r.query_id): r.vector for r in queries.collect()}
    for r in got:
        want = float(np.sum((np.array(qmat[int(r.query_id)]) - np.array(V_C)) ** 2))
        assert r.distance == pytest.approx(want, rel=1e-6)


def test_updates_only_window_bounds_inclusive(spark, tmp_path, source, queries):
    uri = str(tmp_path / "flat")
    _history(FlatIndex, spark, uri, source)
    # [start, end] is inclusive both ends (the reference hands the tuple
    # to a TileDB open whose bounds are inclusive)
    assert _ids(open_index(spark, uri, timestamp=(2500, 2500)), queries) == {
        777_003
    }
    # open-ended end: everything from start on; 777_001's delete at 2000
    # is its latest write → excluded
    assert _ids(open_index(spark, uri, timestamp=(1500, None)), queries) == {
        777_002,
        777_003,
    }


def test_range_from_corpus_start_equals_int_open(
    spark, tmp_path, source, queries
):
    uri = str(tmp_path / "flat")
    _history(FlatIndex, spark, uri, source)
    for start in (None, 500, 1000):
        ranged = open_index(spark, uri, timestamp=(start, 2000))
        assert ranged.query_base_array
        want = _ids(open_index(spark, uri, timestamp=2000), queries)
        assert _ids(ranged, queries) == want


@pytest.mark.parametrize(
    "cls,kw",
    [
        (IVFFlatIndex, {"partitions": 4}),
        (IVFPQIndex, {"partitions": 4, "num_subspaces": 8}),
        (VamanaIndex, {"shards": 2}),
    ],
)
def test_partitioned_types_updates_only_query(
    spark, tmp_path, source, queries, cls, kw
):
    """The partitioned types answer updates-only range opens with the
    exact additions scan — probe knobs are ignored (there is no base to
    probe), results match FLAT on the same history."""
    uri = str(tmp_path / "idx")
    _history(cls, spark, uri, source, **kw)
    flat_uri = str(tmp_path / "flat")
    _history(FlatIndex, spark, flat_uri, source)
    want = {
        (r.query_id, r.rank, r.external_id)
        for r in open_index(spark, flat_uri, timestamp=(1200, None))
        .query(queries, 2)
        .collect()
    }
    idx = open_index(spark, uri, timestamp=(1200, None))
    got = {
        (r.query_id, r.rank, r.external_id)
        for r in idx.query(queries, 2, nprobe=1).collect()
    }
    assert got == want


def test_updates_only_refuses_base_backed_operations(
    spark, tmp_path, source
):
    uri = str(tmp_path / "ivf")
    _history(IVFFlatIndex, spark, uri, source, partitions=4)
    idx = open_index(spark, uri, timestamp=(1200, None))
    with pytest.raises(ValueError, match="updates-only"):
        idx.consolidate_updates()
    with pytest.raises(ValueError, match="updates-only"):
        idx.measure_recall_curve()
    with pytest.raises(ValueError, match="updates-only"):
        idx.partition_stats()


def test_updates_only_describe_reports_the_window(spark, tmp_path, source):
    """describe() on an updates-only handle must not touch the base
    (partition balance / overlay extras crash without one) — it reports
    the window instead."""
    uri = str(tmp_path / "ivf")
    _history(IVFFlatIndex, spark, uri, source, partitions=4)
    d = open_index(spark, uri, timestamp=(1200, 2600)).describe()
    assert d["range_open"] == [1200, 2600]
    assert d["size"] == 2  # 777_002 + 777_003 live in the window
    assert "partition_rows_max" not in d and "partitions" not in d


def test_range_open_validation(spark, tmp_path, source):
    uri = str(tmp_path / "flat")
    _history(FlatIndex, spark, uri, source)
    with pytest.raises(ValueError, match="start, end"):
        open_index(spark, uri, timestamp=(1, 2, 3))
    # a range ending before the first ingestion has nothing to read —
    # same loud contract as the int open (documented divergence from the
    # reference's silent empty result)
    with pytest.raises(ValueError, match="no ingestion"):
        open_index(spark, uri, timestamp=(None, 500))


def test_updates_only_excluded_ids_and_pad(spark, tmp_path, source, queries):
    uri = str(tmp_path / "flat")
    _history(FlatIndex, spark, uri, source)
    idx = open_index(spark, uri, timestamp=(1500, None))
    excl = idx.spark.createDataFrame([(777_002,)], "external_id long")
    got = idx.query(queries, K, excluded_ids=excl, pad=True)
    rows = got.collect()
    assert {int(r.external_id) for r in rows if r.external_id is not None} == {
        777_003
    }
    # pad keeps the per-query row count contract even on a tiny window
    assert len(rows) == queries.count() * K
