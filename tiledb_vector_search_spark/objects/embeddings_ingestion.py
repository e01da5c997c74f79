"""Two-stage embeddings ingestion: materialize embeddings, then index.

Reference: ``object_api/embeddings_ingestion.py:7-604`` —
``ingest_embeddings_with_driver`` builds a two-node task DAG (embeddings
generation → vector indexing) so each stage retries independently.

Spark mapping: stage 1 writes the embedded vectors to a parquet staging
dataset — the durable checkpoint between the expensive model stage and the
index build; stage 2 reads the staged vectors back and runs the normal
index ingest.  With ``resume=True`` a completed stage 1 (``_SUCCESS``
marker present) is never recomputed, mirroring the reference driver's
per-stage retry/restart semantics.

At 100 TB the embedding stage dominates cost (model inference over every
object); decoupling it from indexing means a failed k-means retrain never
re-runs inference, and the same staged vectors can feed several index
types (FLAT for ground truth + IVF_FLAT for serving, say) without paying
the model twice.
"""

from __future__ import annotations

import posixpath
from typing import Any

from pyspark.sql import SparkSession

from tiledb_vector_search_spark.objects.embeddings import ObjectEmbedding
from tiledb_vector_search_spark.objects.object_index import (
    _INDEX_TYPES,
    ObjectIndex,
    _write_object_group,
)
from tiledb_vector_search_spark.objects.readers import ObjectReader
from tiledb_vector_search_spark.storage import HadoopFS, now_ms


def ingest_embeddings_with_driver(
    spark: SparkSession,
    uri: str,
    reader: ObjectReader,
    embedding: ObjectEmbedding,
    index_type: str = "IVF_FLAT",
    embeddings_uri: str | None = None,
    resume: bool = False,
    timestamp: int | None = None,
    **ingest_kw: Any,
) -> ObjectIndex:
    """Stage 1: read → embed → write staging parquet.  Stage 2: staged
    vectors → index ingest.  Returns the opened :class:`ObjectIndex`.

    ``embeddings_uri`` overrides the staging location (default
    ``<uri>/embeddings_staging``); pass ``resume=True`` to reuse an already
    completed stage 1.
    """
    if index_type not in _INDEX_TYPES:
        raise ValueError(f"unknown index_type {index_type!r}")
    ts = timestamp if timestamp is not None else now_ms()
    uri = uri.rstrip("/")
    staging = (embeddings_uri or posixpath.join(uri, "embeddings_staging")).rstrip("/")
    # bind the probe to the STAGING uri's filesystem: the docstring
    # invites a cross-scheme embeddings_uri (e.g. file:/ staging beside
    # an s3a:// index), and Hadoop's checkPath throws 'Wrong FS' instead
    # of returning False when the schemes differ
    fs = HadoopFS(spark, staging)

    need_stage1 = not (resume and fs.exists(posixpath.join(staging, "_SUCCESS")))
    # resuming with no metadata columns never touches the object source —
    # the staged vectors are the complete stage-1 output
    objects = None
    if need_stage1 or reader.metadata_attributes():
        objects = reader.read_objects(spark)
    if need_stage1:
        vectors = embedding.transform(objects, reader.payload_columns())
        vectors.write.mode("overwrite").parquet(staging)

    staged = spark.read.parquet(staging)
    _INDEX_TYPES[index_type].ingest(
        spark,
        posixpath.join(uri, "vector_index"),
        staged,
        timestamp=ts,
        **ingest_kw,
    )
    _write_object_group(spark, uri, reader, embedding, objects, index_type, ts)
    return ObjectIndex(spark, uri)
