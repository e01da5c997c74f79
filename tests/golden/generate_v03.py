"""Generate the spark-0.3 golden index corpus (residual IVF_PQ).

spark-0.3 changed exactly one on-disk semantic: IVF_PQ codes quantize
the COARSE RESIDUAL (vector − assigned centroid) instead of the raw
vector, recorded by the ``pq_residual`` meta flag.  This corpus freezes
one such index plus its query snapshot so the residual read path is
pinned against committed bytes the same way spark-0.1/0.2 raw-code
reads are.  The other index types' layouts are unchanged in 0.3 — their
0.2 corpora remain the authority.

Run once from the repo root (only when a NEW storage version ships —
then this corpus is frozen and the next version gets its own):

    PYTHONPATH=/root/repo python tests/golden/generate_v03.py
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

GOLDEN_ROOT = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(GOLDEN_ROOT, "spark-0.3")

N, DIMS, K, NQ = 96, 8, 5, 3


def golden_vectors() -> tuple[np.ndarray, np.ndarray]:
    # same seed as generate_v02: identical source vectors, different codes
    rng = np.random.default_rng(20260815)
    mat = np.round(rng.standard_normal((N, DIMS)), 3).astype(np.float64)
    return np.arange(N, dtype=np.int64), mat


def main() -> None:
    from tiledb_vector_search_spark import get_spark
    from tiledb_vector_search_spark.indexes import IVFPQIndex
    from tiledb_vector_search_spark.session import small_df

    spark = get_spark(app_name="golden-gen-03", shuffle_partitions=4,
                      master="local[4]")
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

    pq = IVFPQIndex.ingest(
        spark, os.path.join(CORPUS, "ivf_pq"), src, partitions=4,
        num_subspaces=4, timestamp=1000,
    )
    assert pq.pq_residual, "spark-0.3 ingest must write residual codes"
    rows = (
        pq.query(queries, K, nprobe=4, k_factor=4.0)
        .orderBy("query_id", "rank")
        .collect()
    )
    expected["results"]["ivf_pq"] = [
        [int(r.query_id), int(r.rank), int(r.external_id),
         round(float(r.distance), 6)]
        for r in rows
    ]

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
