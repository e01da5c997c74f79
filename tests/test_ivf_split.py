"""Hot-cell splitting at consolidation + partition skew surface (r10).

IVF cells grow unevenly under upsert-heavy churn (new data clusters
where the corpus is growing, not where the centroids were trained); a
hot cell is a hot probe AND a hot cogroup task.  The reference's answer
is a full re-ingest (``partition_history``, ``index.py:678-695``);
``consolidate_updates(split_hot_cells=True)`` is the surgical twin —
only cells over the cap retrain, cold centroids survive byte-identical,
and one final full re-assign keeps the assignment-is-argmin invariant
probe routing relies on.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes import IVFFlatIndex

DIM = 8


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(11)
    rows = []
    # one mega-cluster: 1500 rows at 100·e0
    for i in range(1500):
        v = rng.normal(0, 0.5, DIM)
        v[0] += 100.0
        rows.append((i, [float(x) for x in v]))
    # three small clusters of 100 on other axes
    for c in range(1, 4):
        for j in range(100):
            v = rng.normal(0, 0.5, DIM)
            v[c] += 100.0
            rows.append((10_000 * c + j, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "external_id long, vector array<float>"
    )


def _exact(idx, src, q, k):
    from tiledb_vector_search_spark.operators.knn import knn_bruteforce_expr

    return knn_bruteforce_expr(src, q, k).select(
        "query_id", "external_id"
    ).collect()


def test_split_hot_cells_rebalances_and_stays_exact(spark, skewed, tmp_path):
    idx = IVFFlatIndex.ingest(
        spark, str(tmp_path / "ivf"), skewed, partitions=4, timestamp=1000
    )
    stats0 = {
        int(r["partition_id"]): int(r["rows"])
        for r in idx.partition_stats().collect()
    }
    hot0 = max(stats0.values())
    assert hot0 >= 1200  # the mega-cluster landed in one cell
    assert idx.partition_history == [4]

    idx2 = idx.consolidate_updates(
        timestamp=2000, split_hot_cells=True, cell_cap=400
    )
    stats1 = {
        int(r["partition_id"]): int(r["rows"])
        for r in idx2.partition_stats().collect()
    }
    # the hot cell split into ~ceil(1500/400)=4 sub-cells; cold cells kept
    assert idx2.partitions > 4
    assert sum(stats1.values()) == sum(stats0.values())
    assert max(stats1.values()) < hot0
    assert idx2.partition_history == [4, idx2.partitions]

    # assignment-is-argmin invariant: stored pid == nearest centroid
    from tiledb_vector_search_spark.ml.kmeans import assign_partitions_expr

    base = idx2._base_vectors().select("external_id", "vector", "partition_id")
    re = assign_partitions_expr(
        base.select("external_id", "vector"), idx2.centroids()
    ).withColumnRenamed("partition_id", "re_pid")
    mismatch = (
        base.join(re, "external_id")
        .where(F.col("partition_id") != F.col("re_pid"))
        .count()
    )
    assert mismatch == 0

    # exactness: full probe == brute force, before and after
    q = skewed.where("external_id IN (0, 10000, 20000)").select(
        F.col("external_id").alias("query_id"), "vector"
    )
    want = sorted(
        (int(r["query_id"]), int(r["external_id"]))
        for r in _exact(idx2, skewed, q, 5)
    )
    got = sorted(
        (int(r["query_id"]), int(r["external_id"]))
        for r in idx2.query(q, 5, nprobe=idx2.partitions).collect()
    )
    assert got == want


def test_split_noop_when_nothing_hot(spark, skewed, tmp_path):
    """split_hot_cells with a generous cap: no cell splits, the first
    assignment pass is reused (no second corpus scan), result unchanged."""
    idx = IVFFlatIndex.ingest(
        spark, str(tmp_path / "ivf"), skewed, partitions=4, timestamp=1000
    )
    idx2 = idx.consolidate_updates(
        timestamp=2000, split_hot_cells=True, cell_cap=10_000
    )
    assert idx2.partitions == 4
    assert idx2.partition_history == [4, 4]


def test_split_deterministic(spark, skewed, tmp_path):
    """Hash-ordered sampling + fixed seed: two consolidations of the
    same tree split to the same centroid count and identical
    assignments."""
    outs = []
    for tag in ("a", "b"):
        idx = IVFFlatIndex.ingest(
            spark, str(tmp_path / tag), skewed, partitions=4, timestamp=1000
        )
        idx2 = idx.consolidate_updates(
            timestamp=2000, split_hot_cells=True, cell_cap=400
        )
        outs.append(
            (
                idx2.partitions,
                sorted(
                    (int(r["external_id"]), int(r["partition_id"]))
                    for r in idx2._base_vectors()
                    .select("external_id", "partition_id")
                    .collect()
                ),
            )
        )
    assert outs[0] == outs[1]


def test_split_after_update_churn(spark, skewed, tmp_path):
    """The motivating scenario: churn concentrates in one region, the
    updates fold makes a cell hot, the next consolidation splits it —
    and the folded updates stay queryable."""
    idx = IVFFlatIndex.ingest(
        spark, str(tmp_path / "ivf"), skewed, partitions=4, timestamp=1000
    )
    rng = np.random.default_rng(5)
    add = []
    for j in range(400):
        v = rng.normal(0, 0.5, DIM)
        v[0] += 100.0  # more growth in the already-hot region
        add.append((50_000 + j, [float(x) for x in v]))
    idx.update_batch(add, timestamp=1500)
    idx2 = idx.consolidate_updates(
        timestamp=2000, split_hot_cells=True, cell_cap=400
    )
    assert idx2.partitions > 4
    q = spark.createDataFrame(
        [(0, add[0][1])], "query_id long, vector array<float>"
    )
    hits = {
        int(r["external_id"])
        for r in idx2.query(q, 1, nprobe=idx2.partitions).collect()
    }
    assert hits == {50_000}


def test_consolidate_refuses_unknown_kwargs(spark, skewed, tmp_path):
    """A consolidation knob the index type does not honor is refused BY
    NAME (the query-kwarg contract applied to the DML surface): a typo
    or a cross-type knob must never silently change nothing."""
    from tiledb_vector_search_spark.indexes import (
        FlatIndex,
        IVFPQIndex,
    )

    ivf = IVFFlatIndex.ingest(
        spark, str(tmp_path / "i"), skewed, partitions=4, timestamp=1000
    )
    with pytest.raises(TypeError, match="retrian_index"):
        ivf.consolidate_updates(timestamp=2000, retrian_index=True)
    flat = FlatIndex.ingest(
        spark, str(tmp_path / "f"), skewed, timestamp=1000
    )
    with pytest.raises(TypeError, match="split_hot_cells"):
        flat.consolidate_updates(timestamp=2000, split_hot_cells=True)
    pq = IVFPQIndex.ingest(
        spark, str(tmp_path / "p"), skewed, partitions=4, timestamp=1000
    )
    # cross-type knob: `shards` is Vamana's; PQ refuses it by name
    with pytest.raises(TypeError, match="shards"):
        pq.consolidate_updates(timestamp=2000, shards=8)
    # retrain already re-trains everything — combining it with a
    # surgical split is ambiguous and refused, not silently resolved
    with pytest.raises(ValueError, match="ambiguous"):
        pq.consolidate_updates(
            timestamp=2000, retrain_index=True, split_hot_cells=True
        )
    with pytest.raises(ValueError, match="ambiguous"):
        ivf.consolidate_updates(
            timestamp=2000, retrain_index=True, split_hot_cells=True
        )


def test_snapshot_artifact_cache_exact_across_reingest(spark, skewed, tmp_path):
    """The process-wide centroid cache is keyed on snapshot_nonce: two
    handles of ONE snapshot share the loaded array (streaming re-opens
    stop paying a collect per batch), while delete_index + re-ingest at
    the SAME uri and timestamp — a different snapshot with identical
    (uri, ts) — must NOT serve the old centroids."""
    from tiledb_vector_search_spark.indexes import IVFFlatIndex

    uri = str(tmp_path / "ivf")
    IVFFlatIndex.ingest(spark, uri, skewed, partitions=4, timestamp=1000)
    a = IVFFlatIndex(spark, uri).centroids()
    b = IVFFlatIndex(spark, uri).centroids()
    assert a is b  # same snapshot → same cached object, no re-collect

    IVFFlatIndex.delete_index(spark, uri)
    other = skewed.select(
        "external_id",
        F.transform("vector", lambda x: x * F.lit(2.0) + F.lit(7.0)).cast(
            "array<float>"
        ).alias("vector"),
    )
    IVFFlatIndex.ingest(spark, uri, other, partitions=4, timestamp=1000)
    c = IVFFlatIndex(spark, uri).centroids()
    assert c is not a
    assert not np.allclose(c, a)  # fresh snapshot's own centroids


# -- round 11: splitting on IVF_PQ (coarse cells) and VAMANA (shards) --------


def test_pq_split_rebalances_and_rerank_stays_exact(spark, skewed, tmp_path):
    """IVF_PQ hot-cell split: coarse cells over the cap split, cold
    centroids survive, and full probe + exhaustive exact re-rank
    (k·k_factor ≥ corpus) still equals brute force — the fold re-encodes
    residuals against the final centroid set, so rebalancing is
    invisible to exact-rerank results."""
    from tiledb_vector_search_spark.indexes import IVFPQIndex

    idx = IVFPQIndex.ingest(
        spark, str(tmp_path / "pq"), skewed, partitions=4, timestamp=1000,
        num_subspaces=4,
    )
    stats0 = {
        int(r["partition_id"]): int(r["rows"])
        for r in idx.partition_stats().collect()
    }
    assert max(stats0.values()) >= 1200
    idx2 = idx.consolidate_updates(
        timestamp=2000, split_hot_cells=True, cell_cap=400
    )
    stats1 = {
        int(r["partition_id"]): int(r["rows"])
        for r in idx2.partition_stats().collect()
    }
    assert idx2.partitions > 4
    assert sum(stats1.values()) == sum(stats0.values())
    assert max(stats1.values()) < max(stats0.values())
    assert idx2.partition_history == [4, idx2.partitions]

    # assignment-is-argmin on the split snapshot
    from tiledb_vector_search_spark.ml.kmeans import assign_partitions_expr

    base = idx2._base_vectors().select("external_id", "vector", "partition_id")
    re = assign_partitions_expr(
        base.select("external_id", "vector"), idx2.centroids()
    ).withColumnRenamed("partition_id", "re_pid")
    assert (
        base.join(re, "external_id")
        .where(F.col("partition_id") != F.col("re_pid"))
        .count()
        == 0
    )

    # exactness through the rebalance: full probe, exhaustive re-rank
    n = skewed.count()
    q = skewed.where("external_id IN (0, 10000, 20000)").select(
        F.col("external_id").alias("query_id"), "vector"
    )
    want = sorted(
        (int(r["query_id"]), int(r["external_id"]))
        for r in _exact(idx2, skewed, q, 5)
    )
    got = sorted(
        (int(r["query_id"]), int(r["external_id"]))
        for r in idx2.query(
            q, 5, nprobe=idx2.partitions, k_factor=float(-(-n // 5))
        ).collect()
    )
    assert got == want


def test_pq_split_cold_cell_codes_byte_identical(spark, skewed, tmp_path):
    """The surgical invariant on PQ: rows that stay assigned to a cold
    (unsplit) centroid keep byte-identical residual codes through the
    split-fold — same centroid, same codebooks, deterministic kernel."""
    import numpy as np

    from tiledb_vector_search_spark.indexes import IVFPQIndex

    idx = IVFPQIndex.ingest(
        spark, str(tmp_path / "pq"), skewed, partitions=4, timestamp=1000,
        num_subspaces=4,
    )
    old_centroids = idx.centroids()
    old = {
        int(r["external_id"]): (int(r["partition_id"]), bytes(r["code"]))
        for r in idx._base_vectors()
        .select("external_id", "partition_id", "code")
        .collect()
    }
    idx2 = idx.consolidate_updates(
        timestamp=2000, split_hot_cells=True, cell_cap=400
    )
    new_centroids = idx2.centroids()
    # cold old pid -> new pid by exact centroid identity
    cold_map = {}
    for i, c in enumerate(old_centroids):
        hits = np.where((new_centroids == c).all(axis=1))[0]
        if len(hits) == 1:
            cold_map[i] = int(hits[0])
    assert cold_map, "some centroids must survive the split untouched"
    new = {
        int(r["external_id"]): (int(r["partition_id"]), bytes(r["code"]))
        for r in idx2._base_vectors()
        .select("external_id", "partition_id", "code")
        .collect()
    }
    checked = 0
    for ext, (opid, ocode) in old.items():
        if opid not in cold_map:
            continue
        npid, ncode = new[ext]
        if npid == cold_map[opid]:  # stayed on the same cold centroid
            assert ncode == ocode, ext
            checked += 1
    assert checked >= 250  # the three cold clusters stay put


def test_vamana_split_rebalances_shards(spark, skewed, tmp_path):
    """VAMANA shard split: the over-cap shard (a sequential graph-build
    straggler) splits into sub-shards, cold shard centroids survive,
    and self-search still finds every planted probe after the fold."""
    from tiledb_vector_search_spark.indexes import VamanaIndex

    idx = VamanaIndex.ingest(
        spark, str(tmp_path / "vam"), skewed, shards=4, timestamp=1000
    )
    stats0 = {
        int(r["partition_id"]): int(r["rows"])
        for r in idx.partition_stats().collect()
    }
    assert max(stats0.values()) >= 1200
    idx2 = idx.consolidate_updates(
        timestamp=2000, split_hot_cells=True, cell_cap=400
    )
    stats1 = {
        int(r["partition_id"]): int(r["rows"])
        for r in idx2.partition_stats().collect()
    }
    assert idx2.partitions > 4
    assert sum(stats1.values()) == sum(stats0.values())
    assert max(stats1.values()) < max(stats0.values())
    assert idx2.partition_history == [4, idx2.partitions]

    # self-search: each probed vector finds itself at rank 1 across the
    # split shards (routing + per-shard walk agree with the new layout)
    q = skewed.where(
        "external_id IN (0, 7, 10000, 20000, 30000)"
    ).select(F.col("external_id").alias("query_id"), "vector")
    hits = idx2.query(q, 1, nprobe=idx2.partitions, l_search=50).collect()
    assert {int(r["query_id"]) for r in hits} == {0, 7, 10000, 20000, 30000}
    for r in hits:
        assert int(r["external_id"]) == int(r["query_id"])


def test_vamana_split_noop_reuses_first_pass(spark, skewed, tmp_path):
    from tiledb_vector_search_spark.indexes import VamanaIndex

    idx = VamanaIndex.ingest(
        spark, str(tmp_path / "vam"), skewed, shards=4, timestamp=1000
    )
    idx2 = idx.consolidate_updates(
        timestamp=2000, split_hot_cells=True, cell_cap=10_000
    )
    assert idx2.partitions == 4
    assert idx2.partition_history == [4, 4]


def test_pq_split_noop_when_nothing_hot(spark, skewed, tmp_path):
    from tiledb_vector_search_spark.indexes import IVFPQIndex

    idx = IVFPQIndex.ingest(
        spark, str(tmp_path / "pq"), skewed, partitions=4, timestamp=1000,
        num_subspaces=4,
    )
    idx2 = idx.consolidate_updates(
        timestamp=2000, split_hot_cells=True, cell_cap=10_000
    )
    assert idx2.partitions == 4
    assert idx2.partition_history == [4, 4]
