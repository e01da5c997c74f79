"""Deterministic sampling / splitting for reproducible training pipelines.

``df.sample()`` is seed-dependent on partitioning and row order, which a
100 TB pipeline cannot accept: re-running after a repartition must select
the SAME documents, and train/test membership must be stable for the life
of the corpus.  The standard fix is content-keyed hash bucketing: bucket =
``stable_hash64(key ∥ salt) mod 1e6``, select by bucket range.  Properties:

- reproducible across runs, partitionings, and engines (the md5-based
  ``stable_hash64`` has an exact DuckDB twin, so splits are
  oracle-checkable);
- pure Catalyst filter/projection — no shuffle, no state, vectorized;
- disjoint-by-construction splits (bucket ranges partition [0, 1e6));
- adding data never reassigns existing keys (per-key, not per-position).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.text import stable_hash64

_BUCKETS = 1_000_000


def _bucket(key_col: str, salt: str) -> Column:
    return F.pmod(
        stable_hash64(F.col(key_col).cast("string"), salt=salt), F.lit(_BUCKETS)
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ~``fraction`` sample, stable under re-runs/repartition."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    return df.where(_bucket(key_col, salt) < int(fraction * _BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Adds ``split_col`` assigning each row to a named split.

    ``splits`` maps name → fraction (must sum to ≤ 1; any remainder is
    labeled ``holdout``).  Assignment is by disjoint bucket range in
    insertion order, so it is deterministic and exactly reproducible.
    """
    if not splits:
        raise ValueError(
            "hash_split needs at least one named split (an empty dict "
            "would label every row 'holdout')"
        )
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bucket = _bucket(key_col, salt)
    expr = None
    lo = 0
    for name, frac in splits.items():
        hi = lo + int(frac * _BUCKETS)
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(split_col, expr.otherwise("holdout"))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive.

    A training corpus is rebalanced by sampling each source/language at its
    own rate (e.g. keep 100% of books, 10% of crawl).  Same hash-bucket
    determinism as :func:`hash_sample`, with the threshold chosen per
    stratum; strata not in ``fractions`` get ``default_fraction``.  Still a
    pure Catalyst filter — no shuffle, no per-stratum passes.
    """
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0,1], got {frac}")
    bucket = _bucket(key_col, salt)
    thresh = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        val = F.lit(int(frac * _BUCKETS))
        thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
    thresh = (
        thresh.otherwise(int(default_fraction * _BUCKETS))
        if thresh is not None
        else F.lit(int(default_fraction * _BUCKETS))
    )
    return df.where(bucket < thresh)


def duckdb_bucket_sql(key_expr: str, salt: str) -> str:
    """DuckDB twin of the bucket expression, for oracle queries."""
    from tiledb_vector_search_spark.functions.text import (
        duckdb_stable_hash64_sql,
    )

    h = duckdb_stable_hash64_sql(f"CAST({key_expr} AS VARCHAR)", salt=salt)
    # pmod: stable_hash64 is non-negative (60-bit), plain % suffices
    return f"({h} % {_BUCKETS})"
