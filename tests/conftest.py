from __future__ import annotations

import os

import numpy as np
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from tiledb_vector_search_spark import get_spark

    s = get_spark(app_name="tvs-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def embeddings_np(sf_dir):
    """(ids, matrix) from the driver testdata embeddings table."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def numpy_topk(
    qmat: np.ndarray,
    ids: np.ndarray,
    xmat: np.ndarray,
    k: int,
    metric: str = "sum_of_squares",
):
    """Brute-force oracle: list of [(id, dist)] per query, (dist, id) order."""
    results = []
    for q in qmat:
        if metric == "inner_product":
            d = xmat @ q
            order = np.lexsort((ids, -d))
        else:
            diff = xmat - q
            d = np.einsum("ij,ij->i", diff, diff)
            if metric == "l2":
                d = np.sqrt(d)
            elif metric == "cosine":
                d = 1.0 - (xmat @ q) / (
                    np.linalg.norm(xmat, axis=1) * np.linalg.norm(q)
                )
            order = np.lexsort((ids, d))
        results.append([(int(ids[i]), float(d[i])) for i in order[:k]])
    return results
