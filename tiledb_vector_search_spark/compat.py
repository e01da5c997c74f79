"""Reference-named module-level API, mapped onto the Spark-native engine.

The reference exports C++ kernel bindings at module level
(``module.py:60-505``: ``load_as_array``, ``query_vq_nth``,
``query_vq_heap``, ``ivf_query``, ``partition_ivf_index``,
``validate_top_k``) alongside the index classes.  A user switching from the
reference reaches for these names; each maps here onto the engine's
existing machinery — numpy for the driver-side array forms (the reference's
matrices are in-RAM objects too), the distributed DataFrame plans for
everything index-shaped.

Intentionally NOT re-exported: ``Mode`` (cloud-DAG scheduling — Spark's
scheduler replaces it), ``array_to_matrix``/``load_as_matrix`` (Arrow and
numpy subsume the col-major matrix classes; ``load_as_array`` returns the
numpy form directly), ``ivf_index_tdb`` (TileDB-array-specific variant).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiledb_vector_search_spark.operators.knn import partial_topk_idx
from tiledb_vector_search_spark.operators.routing import route_queries
from tiledb_vector_search_spark.schemas import ID_COL, VECTOR_COL
from tiledb_vector_search_spark.storage import STORAGE_VERSION  # noqa: F401

__all__ = [
    "load_as_array",
    "query_vq_nth",
    "query_vq_heap",
    "ivf_query",
    "ivf_query_ram",
    "ivf_index",
    "partition_ivf_index",
    "validate_top_k",
    "STORAGE_VERSION",
]


def load_as_array(
    source: DataFrame | str,
    spark: SparkSession | None = None,
    size: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, matrix) from a vectors DataFrame or parquet path, sorted by id
    (reference ``load_as_array``, ``module.py:60-86`` — a bounded driver
    materialization there too; ``size`` caps rows like the reference's).
    """
    if isinstance(source, str):
        if spark is None:
            raise ValueError("pass spark= when loading from a path")
        df = spark.read.parquet(source)
    else:
        df = source
    cols = df.columns
    id_col = ID_COL if ID_COL in cols else cols[0]
    vec_col = VECTOR_COL if VECTOR_COL in cols else cols[1]
    q = df.select(F.col(id_col), F.col(vec_col)).orderBy(id_col)
    if size is not None:
        q = q.limit(size)
    rows = q.collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def _vq(db: np.ndarray, db_ids: np.ndarray, q: np.ndarray, k: int):
    dmat = (
        np.sum(q * q, axis=1)[:, None]
        - 2.0 * (q @ db.T)
        + np.sum(db * db, axis=1)[None, :]
    )
    idx = partial_topk_idx(dmat, db_ids, min(k, db.shape[0]))
    # partial selection is unordered — order each row by (distance, id)
    rows = np.arange(q.shape[0])[:, None]
    kept_d, kept_i = dmat[rows, idx], db_ids[idx]
    for r in range(idx.shape[0]):
        o = np.lexsort((kept_i[r], kept_d[r]))
        kept_d[r], kept_i[r] = kept_d[r][o], kept_i[r][o]
    return np.sqrt(np.maximum(kept_d, 0.0)), kept_i


def query_vq_nth(
    db: np.ndarray, db_ids: np.ndarray, queries: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force L2 top-k over in-RAM arrays → (distances, ids), each
    (nq, k) (reference ``query_vq_nth``, ``module.py:103-121`` —
    nth_element selection).  Selection strategy is an implementation detail
    here: ``partial_topk_idx`` is argpartition (the nth_element analogue)
    with deterministic (distance, id) ties."""
    return _vq(np.asarray(db, float), np.asarray(db_ids), np.asarray(queries, float), k)


def query_vq_heap(
    db: np.ndarray, db_ids: np.ndarray, queries: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reference ``query_vq_heap`` (``module.py:123-141``) — same contract
    as :func:`query_vq_nth`; the heap-vs-nth distinction is a C++ kernel
    implementation detail with identical results."""
    return query_vq_nth(db, db_ids, queries, k)


def partition_ivf_index(
    centroids: np.ndarray, queries: np.ndarray, nprobe: int = 1
) -> list[tuple[int, int]]:
    """(query_pos, partition) probe routing (reference
    ``partition_ivf_index``, ``module.py:445-460``)."""
    qids = np.arange(np.asarray(queries).shape[0], dtype=np.int64)
    return route_queries(
        qids, np.asarray(queries, float), np.asarray(centroids, float), nprobe
    )


def ivf_index(
    spark: SparkSession,
    uri: str,
    source: DataFrame,
    partitions: int | None = None,
    **kw: Any,
):
    """Standalone IVF build (reference ``ivf_index``, ``module.py:380-430``)
    — wraps :meth:`IVFFlatIndex.ingest`."""
    from tiledb_vector_search_spark.indexes import IVFFlatIndex

    return IVFFlatIndex.ingest(spark, uri, source, partitions=partitions, **kw)


def ivf_query(
    index: Any, queries: DataFrame, k: int, nprobe: int | None = None, **kw: Any
) -> DataFrame:
    """Probe-routed IVF query (reference ``ivf_query``, ``module.py:262``)."""
    return index.query(queries, k, nprobe=nprobe, **kw)


def ivf_query_ram(
    index: Any, queries: DataFrame, k: int, nprobe: int | None = None, **kw: Any
) -> DataFrame:
    """Reference ``ivf_query_ram`` — the infinite-RAM variant; here the
    same plan (Spark manages memory; ``memory_budget_mb`` opts into the
    finite-RAM blocked scan instead)."""
    return index.query(queries, k, nprobe=nprobe, **kw)


def validate_top_k(result_ids: np.ndarray, ground_truth: np.ndarray) -> bool:
    """True iff each row of ``result_ids`` equals the ground-truth row as a
    SET (reference ``validate_top_k``, ``module.py:486-490``; its
    ``accuracy()`` is set-intersection based, ``common.py:312``)."""
    r = np.asarray(result_ids)
    g = np.asarray(ground_truth)
    if r.shape != g.shape:
        return False
    return all(set(r[i]) == set(g[i]) for i in range(r.shape[0]))
