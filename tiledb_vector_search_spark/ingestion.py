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


# Pure cloud-DAG scheduler knobs from the reference signature
# (``ingestion.py:42-100``): Spark's scheduler and session config replace
# the reference's task-graph tuning, so these are accepted and IGNORED —
# reference call sites migrate without edits, and none of them can
# change results.
_SCHEDULER_NOOP_KWARGS = {
    "config", "namespace", "workers", "input_vectors_per_work_item",
    "max_tasks_per_stage", "input_vectors_per_work_item_during_sampling",
    "max_sampling_tasks", "verbose", "trace_id", "use_sklearn", "mode",
    "acn", "ingest_resources", "consolidate_partition_resources",
    "copy_centroids_resources", "random_sample_resources",
    "kmeans_resources", "compute_new_centroids_resources",
    "assign_points_and_partial_new_centroids_resources",
    "write_centroids_resources", "partial_index_resources",
    "object_api_resources",
}

# Reference kwargs that DO change results and have a different
# Spark-native spelling: raise with the redirect instead of a bare
# TypeError (and never silently ignore them).
_REDIRECT_KWARGS = {
    "input_vectors": "pass the vectors as the `source` DataFrame "
                     "(spark.createDataFrame or session.small_df)",
    "source_uri": "decode the file first: "
                  "sources.vecs.read_vectors(spark, source_uri)",
    "source_type": "sources.vecs.read_vectors(..., source_type=...)",
    "external_ids": "join the ids into the source DataFrame and point "
                    "id_col= at them",
    "external_ids_uri":
        "sources.vecs.read_vectors(..., external_ids_uri=...)",
    "external_ids_type": "sources.vecs.read_vectors reads U64BIN ids",
    "updates_uri": "the updates log lives inside the index group; load "
                   "the rows and apply Index.update_batch after ingest",
    "size": "bound the source DataFrame explicitly: source.limit(size)",
    "copy_centroids_uri": "pass copy_centroids_from= (a numpy matrix) "
                          "to the IVF ingest",
    "training_input_vectors": "pass training_sample_size= or "
                              "copy_centroids_from= instead",
    "training_source_uri": "read it with sources.vecs.read_vectors and "
                           "train via copy_centroids_from=",
    "training_source_type": "see training_source_uri",
    "training_sampling_policy": "sampling here is hash-ordered and "
                                "deterministic; training_sample_size= "
                                "bounds it",
    "storage_version": "the engine writes its own layout version "
                       "(storage.STORAGE_VERSION); every released "
                       "layout stays read-compatible",
}


def ingest(
    spark: SparkSession,
    uri: str | None = None,
    source: DataFrame | None = None,
    index_type: str = "IVF_FLAT",
    index_uri: str | None = None,
    **kwargs: Any,
) -> Index:
    """Build an index of ``index_type`` at ``uri`` from ``source``.

    ``kwargs`` pass through to the family's ``ingest`` (``partitions``,
    ``num_subspaces``, ``shards``, ``metric``, ``timestamp``, ...).
    Reference-signature compatibility: ``index_uri=`` aliases ``uri``,
    ``index_timestamp=`` aliases ``timestamp``, the reference's pure
    scheduler knobs (``mode``/``config``/``workers``/``*_resources``/...)
    are accepted and ignored, and semantic reference kwargs with a
    different Spark-native spelling (``source_uri``, ``size``,
    ``external_ids_uri``, ...) raise pointing at the equivalent instead
    of a bare TypeError.
    """
    if uri is None:
        uri = index_uri
    elif index_uri is not None and index_uri != uri:
        raise ValueError("pass either uri or index_uri, not both")
    if uri is None:
        raise ValueError("ingest needs an index uri (uri= or index_uri=)")
    if source is None:
        raise ValueError(
            "ingest needs a `source` DataFrame; file sources decode via "
            "sources.vecs.read_vectors(spark, source_uri)"
        )
    if "index_timestamp" in kwargs:
        alias_ts = kwargs.pop("index_timestamp")
        # mirror the uri/index_uri pair: a silent overwrite of an
        # explicit timestamp would stamp the ingestion somewhere the
        # caller did not ask for
        if kwargs.get("timestamp") is not None and kwargs["timestamp"] != alias_ts:
            raise ValueError(
                "pass either timestamp or index_timestamp, not both "
                f"(got timestamp={kwargs['timestamp']}, "
                f"index_timestamp={alias_ts})"
            )
        kwargs["timestamp"] = alias_ts
    for k in _SCHEDULER_NOOP_KWARGS & kwargs.keys():
        kwargs.pop(k)
    redirected = sorted(_REDIRECT_KWARGS.keys() & kwargs.keys())
    if redirected:
        k = redirected[0]
        raise TypeError(
            f"ingest: reference kwarg {k!r} has a Spark-native spelling "
            f"here — {_REDIRECT_KWARGS[k]}"
        )
    try:
        cls = _INDEX_TYPES[index_type.upper()]
    except KeyError:
        raise ValueError(
            f"unknown index_type {index_type!r}; one of {sorted(_INDEX_TYPES)}"
        ) from None
    return cls.ingest(spark, uri, source, **kwargs)
