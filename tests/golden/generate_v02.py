"""Generate the spark-0.2 (CURRENT layout) golden index corpus.

Companion to ``generate.py`` (the spark-0.1 corpus): pins the layout the
build writes TODAY, across the COMPLETE index family — FLAT (packed-u8),
IVF_FLAT (with a live updates log), IVF_PQ, and VAMANA with the
cross-shard overlay — so when a spark-0.3 layout ships, this corpus is
already committed and old-layout reads stay honest round over round.
Query results are snapshotted at generation time from the committed
bytes; the test replays them, so build-time nondeterminism cannot drift
the contract.

Reference contract: ``test_backwards_compatibility.py:12-60``.

Run once from the repo root (only when a NEW storage version ships —
then this corpus is frozen and the next version gets its own):

    PYTHONPATH=/root/repo python tests/golden/generate_v02.py
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

GOLDEN_ROOT = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(GOLDEN_ROOT, "spark-0.2")

N, DIMS, K, NQ = 96, 8, 5, 3


def golden_vectors() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(20260815)
    mat = np.round(rng.standard_normal((N, DIMS)), 3).astype(np.float64)
    return np.arange(N, dtype=np.int64), mat


def main() -> None:
    from tiledb_vector_search_spark import get_spark
    from tiledb_vector_search_spark.indexes import (
        FlatIndex,
        IVFFlatIndex,
        IVFPQIndex,
        VamanaIndex,
        open_index,
    )
    from tiledb_vector_search_spark.session import small_df

    spark = get_spark(app_name="golden-gen-02", shuffle_partitions=4,
                      master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(CORPUS, ignore_errors=True)

    ids, mat = golden_vectors()
    src = small_df(
        spark,
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, mat)],
        "external_id long, vector array<float>",
    )
    # u8 twin: shift/scale into 0..255 integral values
    u8 = np.clip(np.floor(mat * 32) + 128, 0, 255)
    src_u8 = small_df(
        spark,
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, u8)],
        "external_id long, vector array<float>",
    )
    queries = small_df(
        spark,
        [(int(i), [float(v) for v in mat[i]]) for i in range(NQ)],
        "query_id long, vector array<float>",
    )
    queries_u8 = small_df(
        spark,
        [(int(i), [float(v) for v in u8[i]]) for i in range(NQ)],
        "query_id long, vector array<float>",
    )

    expected: dict[str, object] = {
        "n": N,
        "dims": DIMS,
        "k": K,
        "queries": [[float(v) for v in mat[i]] for i in range(NQ)],
        "queries_u8": [[float(v) for v in u8[i]] for i in range(NQ)],
        "results": {},
    }

    def snapshot(name: str, idx, q, **qkw) -> None:
        rows = idx.query(q, K, **qkw).orderBy("query_id", "rank").collect()
        expected["results"][name] = [
            [int(r.query_id), int(r.rank), int(r.external_id),
             round(float(r.distance), 6)]
            for r in rows
        ]

    flat_u8 = FlatIndex.ingest(
        spark, os.path.join(CORPUS, "flat_u8"), src_u8,
        vector_dtype="uint8", timestamp=1000,
    )
    snapshot("flat_u8", flat_u8, queries_u8)

    ivf_uri = os.path.join(CORPUS, "ivf_flat")
    ivf = IVFFlatIndex.ingest(spark, ivf_uri, src, partitions=4,
                              timestamp=1000)
    # live updates log — overlay resolution is part of the layout contract
    ivf.delete(1, timestamp=2000)
    ivf.update(1_000, [float(v) for v in mat[2]], timestamp=3000)
    snapshot("ivf_flat", open_index(spark, ivf_uri), queries, nprobe=4)

    pq = IVFPQIndex.ingest(
        spark, os.path.join(CORPUS, "ivf_pq"), src, partitions=4,
        num_subspaces=4, timestamp=1000,
    )
    snapshot("ivf_pq", pq, queries, nprobe=4, k_factor=4.0)

    vam = VamanaIndex.ingest(
        spark, os.path.join(CORPUS, "vamana"), src, shards=2,
        overlay=True, timestamp=1000,
    )
    snapshot("vamana", vam, queries, nprobe=2)

    with open(os.path.join(CORPUS, "expected.json"), "w") as f:
        json.dump(expected, f, indent=2, sort_keys=True)

    for root, _dirs, files in os.walk(CORPUS):
        for fn in files:
            if fn.endswith(".crc"):
                os.unlink(os.path.join(root, fn))

    print(f"golden corpus written to {CORPUS}")
    spark.stop()


if __name__ == "__main__":
    main()
