"""Generate the checked-in backwards-compat golden index corpus.

Builds tiny deterministic FLAT and IVF_FLAT indexes (with a live updates
log) and rewrites their metadata to the OLDEST supported layout
(``spark-0.1``: same parquet group shape as 0.2, minus the optional meta
fields 0.2 added).  The outputs under ``tests/golden/spark-0.1/`` are
committed to git; ``tests/test_backwards_compat.py`` opens and queries
them every round, so dropping old-layout read support fails CI instead of
breaking users' on-disk indexes.

Reference contract: ``test_backwards_compatibility.py:12-60`` queries
indexes written by every released version from an on-disk corpus.

Run from the repo root to (re)generate — only needed when a NEW storage
version ships (then the previous version's corpus gets added, never
rewritten):

    PYTHONPATH=/root/repo python tests/golden/generate.py
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

GOLDEN_ROOT = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(GOLDEN_ROOT, "spark-0.1")

N, DIMS, K, NQ = 64, 8, 5, 3


def golden_vectors() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (ids, matrix): values quantized to 3 decimals so the
    float32 round-trip is bit-stable across numpy versions."""
    rng = np.random.default_rng(20260814)
    mat = np.round(rng.standard_normal((N, DIMS)), 3).astype(np.float64)
    return np.arange(N, dtype=np.int64), mat


def main() -> None:
    from pyspark.sql import functions as F

    from tiledb_vector_search_spark import get_spark
    from tiledb_vector_search_spark.indexes import FlatIndex, IVFFlatIndex
    from tiledb_vector_search_spark.session import small_df

    spark = get_spark(app_name="golden-gen", shuffle_partitions=4, master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(CORPUS, ignore_errors=True)

    ids, mat = golden_vectors()
    src = small_df(
        spark,
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, mat)],
        "external_id long, vector array<float>",
    )
    queries = small_df(
        spark,
        [(int(i), [float(v) for v in mat[i]]) for i in range(NQ)],
        "query_id long, vector array<float>",
    )

    expected: dict[str, object] = {
        "n": N,
        "dims": DIMS,
        "k": K,
        "queries": [[float(v) for v in mat[i]] for i in range(NQ)],
        "results": {},
    }

    def snapshot(name: str, idx, **qkw) -> None:
        rows = (
            idx.query(queries, K, **qkw)
            .orderBy("query_id", "rank")
            .collect()
        )
        expected["results"][name] = [
            [int(r.query_id), int(r.rank), int(r.external_id),
             round(float(r.distance), 6)]
            for r in rows
        ]

    flat_uri = os.path.join(CORPUS, "flat")
    flat = FlatIndex.ingest(spark, flat_uri, src, timestamp=1000)
    # live updates log: a tombstone and an addition — old-layout readers
    # must resolve the overlay too, not just the base snapshot
    flat.delete(1, timestamp=2000)
    flat.update(1_000, [float(v) for v in mat[2]], timestamp=3000)
    from tiledb_vector_search_spark.indexes import open_index

    snapshot("flat", open_index(spark, flat_uri))

    ivf_uri = os.path.join(CORPUS, "ivf_flat")
    ivf = IVFFlatIndex.ingest(spark, ivf_uri, src, partitions=4, timestamp=1000)
    # full probe = exact results, so the snapshot is stable no matter how
    # the k-means shards fell at build time
    snapshot("ivf_flat", ivf, nprobe=4)

    # demote the metadata to the spark-0.1 layout: version string swap +
    # drop the meta fields 0.2 added (they are optional on read)
    for name in ("flat", "ivf_flat"):
        meta_path = os.path.join(CORPUS, name, "_index_meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["storage_version"] = "spark-0.1"
        meta.pop("log_compacted_batches", None)
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)

    with open(os.path.join(CORPUS, "expected.json"), "w") as f:
        json.dump(expected, f, indent=2, sort_keys=True)

    # prune Hadoop-local checksum shadows: pure noise in git, and absent
    # .crc files just skip verification on read
    for root, _dirs, files in os.walk(CORPUS):
        for fn in files:
            if fn.endswith(".crc"):
                os.unlink(os.path.join(root, fn))

    print(f"golden corpus written to {CORPUS}")
    spark.stop()


if __name__ == "__main__":
    main()
