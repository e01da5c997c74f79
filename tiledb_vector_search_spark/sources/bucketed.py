"""Bucketed table layout: shuffle-free co-located joins at 100 TB.

A join between two large tables shuffles BOTH sides on the key every time
it runs.  When the same join recurs (vectors ⋈ external-ids, codes ⋈
originals for re-rank, events ⋈ users), pre-bucketing both tables on the
join key moves that shuffle to write time, once: Spark's bucketed scan
exposes the hash-partitioning to Catalyst, which then plans a sort-merge
or shuffled-hash join with NO Exchange on either side.

Bucket-count guidance at scale: pick ``buckets`` so one bucket of the
LARGER table is ~128-512 MB (e.g. 100 TB / 262144 buckets ≈ 400 MB); both
sides must use the SAME count and key for the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by
    ``bucket_col``.  Sorting within buckets lets the subsequent sort-merge
    join skip its Sort as well."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (``spark.table``;
    reading the parquet path directly would drop the bucketing spec and
    reintroduce the join shuffle)."""
    return spark.table(table)
