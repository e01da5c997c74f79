"""Top-level ingestion entry point.

Mirrors the reference's ``ingestion.py ingest()`` dispatcher
(``apis/python/src/tiledb/vector_search/ingestion.py:80-170``: one
``ingest(index_type=..., ...)`` that routes to the index family), so a
reference user can keep calling ``ingest(...)`` instead of the per-class
``ingest`` classmethods.  Sources arrive as a DataFrame (from
``spark.read.parquet`` or :mod:`.sources` file decoders), which subsumes
the reference's ``source_type``/``source_uri`` plumbing.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from tiledb_vector_search_spark.indexes import (
    FlatIndex,
    IVFFlatIndex,
    IVFPQIndex,
    Index,
    VamanaIndex,
)

_INDEX_TYPES = {
    "FLAT": FlatIndex,
    "IVF_FLAT": IVFFlatIndex,
    "IVF_PQ": IVFPQIndex,
    "VAMANA": VamanaIndex,
}


def ingest(
    spark: SparkSession,
    uri: str,
    source: DataFrame,
    index_type: str = "IVF_FLAT",
    **kwargs: Any,
) -> Index:
    """Build an index of ``index_type`` at ``uri`` from ``source``.

    ``kwargs`` pass through to the family's ``ingest`` (``partitions``,
    ``num_subspaces``, ``shards``, ``metric``, ``timestamp``, ...).
    """
    try:
        cls = _INDEX_TYPES[index_type.upper()]
    except KeyError:
        raise ValueError(
            f"unknown index_type {index_type!r}; one of {sorted(_INDEX_TYPES)}"
        ) from None
    return cls.ingest(spark, uri, source, **kwargs)
