"""Canonical schemas for the engine's DataFrames.

Reference data model (SURVEY §1): dense col-major 2D arrays keyed by
position, external-id map array, sparse updates array.  Spark-native
re-expression: one row per vector, ``external_id: long`` +
``vector: array<float>``; updates are an append-only log with a tombstone
flag (reference encodes deletes as empty vectors —
``apis/python/src/tiledb/vector_search/index.py:464-501``; a flag column is
cleaner and keeps ``array()`` vs ``null`` unambiguous, SURVEY §7 risk 6).

IDs: the reference uses uint64 with sentinel MAX_UINT64 (``utils.py:11``).
Spark has no unsigned 64-bit — we use LongType, document the id domain as
[0, 2^63), and use null instead of sentinels for padding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ID_COL = "external_id"
VECTOR_COL = "vector"
PARTITION_COL = "partition_id"
QUERY_ID_COL = "query_id"
DISTANCE_COL = "distance"

VECTOR_SCHEMA = T.StructType(
    [
        T.StructField(ID_COL, T.LongType(), False),
        T.StructField(VECTOR_COL, T.ArrayType(T.FloatType(), False), False),
    ]
)

PARTITIONED_VECTOR_SCHEMA = T.StructType(
    VECTOR_SCHEMA.fields + [T.StructField(PARTITION_COL, T.IntegerType(), False)]
)

QUERY_SCHEMA = T.StructType(
    [
        T.StructField(QUERY_ID_COL, T.LongType(), False),
        T.StructField(VECTOR_COL, T.ArrayType(T.FloatType(), False), False),
    ]
)

# Updates log row (reference: sparse updates array, index.py:876-897).
UPDATES_SCHEMA = T.StructType(
    [
        T.StructField(ID_COL, T.LongType(), False),
        T.StructField(VECTOR_COL, T.ArrayType(T.FloatType(), True), True),
        T.StructField("is_delete", T.BooleanType(), False),
        T.StructField("ts", T.LongType(), False),
    ]
)

CENTROID_SCHEMA = T.StructType(
    [
        T.StructField(PARTITION_COL, T.IntegerType(), False),
        T.StructField("centroid", T.ArrayType(T.DoubleType(), False), False),
    ]
)

# Simple-string dtypes Spark casts to long WITHOUT loss.  Everything
# else is refused at the id boundaries: with ANSI mode off (the Spark
# default) a string id casts to NULL and a fractional id TRUNCATES —
# both silent, both catastrophic for an id column (rows merge under
# one null/truncated key, joins match nothing, deletes no-op).  The
# vector-index id domain is int64 by design (reference uint64 ids, see
# module docstring); corpora with string keys hash/assign an int64 id
# upstream.  The check is type-level — free, no data scan.
_INTEGRAL_ID_TYPES = ("tinyint", "smallint", "int", "bigint")


def integral_id_col(df: DataFrame, col: str, context: str) -> Column:
    """Validated ``df[col]`` → long, for external-id / query-id columns.

    Raises ``TypeError`` on string / fractional / decimal / boolean id
    columns instead of letting the long cast corrupt them silently.
    """
    t = dict(df.dtypes).get(col)
    if t is None:
        raise ValueError(
            f"{context}: no column {col!r} in {list(df.columns)}"
        )
    if t not in _INTEGRAL_ID_TYPES:
        raise TypeError(
            f"{context}: id column {col!r} has type {t}, but ids are "
            f"int64 — a string id would cast to NULL and a fractional "
            f"id would truncate (silently merging distinct ids). "
            f"Assign integral ids upstream (e.g. a hash or a "
            f"monotonically-increasing id) and cast explicitly."
        )
    return F.col(col).cast("long")


# k-NN result row: one row per (query, neighbor) pair, ranked.
KNN_RESULT_SCHEMA = T.StructType(
    [
        T.StructField(QUERY_ID_COL, T.LongType(), False),
        T.StructField(ID_COL, T.LongType(), True),
        T.StructField(DISTANCE_COL, T.DoubleType(), True),
        T.StructField("rank", T.IntegerType(), False),
    ]
)
