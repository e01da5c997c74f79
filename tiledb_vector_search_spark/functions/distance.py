"""Distance metrics as native Catalyst expressions.

The reference implements four metrics in C++ with AVX2/BLAS kernels
(``src/include/scoring.h:90-428``, ``detail/scoring/*_avx.h``).  Spark-first
re-expression: higher-order array functions (``zip_with`` + ``aggregate``)
stay JVM-side inside whole-stage codegen — no Python round trip — and are the
right tool for scoring a *bounded* candidate set (post-routing, re-ranking).
The brute-force hot path over millions of vectors uses the Arrow-vectorized
numpy kernels in :mod:`tiledb_vector_search_spark.operators.knn` instead
(the AVX analogue, SURVEY §4).

All math is promoted to double so results are reproducible across engines
(the DuckDB correctness oracle computes in double after a FLOAT[]→DOUBLE[]
cast; float32 → float64 promotion is exact, and both engines sum
element-wise left-to-right).

Metric semantics mirror ``scoring.h``:
- SUM_OF_SQUARES: Σ(a−b)²            (reference default)
- L2:             √Σ(a−b)²
- COSINE:         1 − cos(a, b)
- INNER_PRODUCT:  ⟨a,b⟩ — the reference returns 1/⟨a,b⟩ so its min-heap
  works (``scoring.h:344-390``, unflipped at ``index.py:287-296``); we order
  by descending score instead and keep the raw value (SURVEY §2.5).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column
from pyspark.sql import functions as F


class DistanceMetric(str, Enum):
    """Mirrors the reference enum ``scoring.h:423-428``."""

    SUM_OF_SQUARES = "sum_of_squares"
    L2 = "l2"
    COSINE = "cosine"
    INNER_PRODUCT = "inner_product"

    @property
    def ascending(self) -> bool:
        """True if smaller values are better (distance), False for scores."""
        return self is not DistanceMetric.INNER_PRODUCT


def _d(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.cast("array<double>")


def sum_of_squares(a: Column | str, b: Column | str) -> Column:
    """Σ(a_i − b_i)² — reference ``scoring.h:90-124``."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """√Σ(a_i − b_i)² — reference ``scoring.h:126-165``."""
    return F.sqrt(sum_of_squares(a, b))


def inner_product(a: Column | str, b: Column | str) -> Column:
    """⟨a,b⟩ — reference ``scoring.h:344-390`` (without the 1/x flip)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_d(a), lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Zero-safe: a zero-norm vector has similarity 0 (distance 1) to
    everything — the numpy kernel's convention (``knn.py
    _kernel_distances``).  Unguarded, the 0/0 division returns NULL and
    the ascending top-k window (NULLS FIRST) would rank a zero vector
    as the #1 neighbor of every query under the expr strategy."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, inner_product(a, b) / denom).otherwise(
        F.lit(0.0)
    )


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """1 − cos(a,b) — reference ``scoring.h:392-421``."""
    return F.lit(1.0) - cosine_similarity(a, b)


def normalize_expr(a: Column | str) -> Column:
    """v / ‖v‖, zero-safe — reference ``utils.py:114-146``.

    Used at ingest for COSINE indexes (the reference pre-normalizes too:
    ``ivf_flat_index.py:254-255,313-321``), so query-time scoring is a plain
    inner product.
    """
    norm = l2_norm(a)
    return F.when(norm == 0.0, _d(a)).otherwise(
        F.transform(_d(a), lambda x: x / norm)
    )


def distance_expr(
    a: Column | str, b: Column | str, metric: DistanceMetric | str
) -> Column:
    """Dispatch a metric name to its column expression.

    Reference dispatch tables: ``module.py:114-121`` etc.
    """
    metric = DistanceMetric(metric)
    if metric is DistanceMetric.SUM_OF_SQUARES:
        return sum_of_squares(a, b)
    if metric is DistanceMetric.L2:
        return l2_distance(a, b)
    if metric is DistanceMetric.COSINE:
        return cosine_distance(a, b)
    if metric is DistanceMetric.INNER_PRODUCT:
        return inner_product(a, b)
    raise ValueError(f"unsupported metric: {metric}")


# --- DuckDB oracle fragments -------------------------------------------------
# The driver's correctness gate runs our Spark plan against DuckDB SQL on the
# same parquet.  These templates produce value-identical doubles: both engines
# promote float32 exactly and fold the sum left-to-right.

def duckdb_distance_sql(a: str, b: str, metric: DistanceMetric | str) -> str:
    metric = DistanceMetric(metric)
    if metric is DistanceMetric.SUM_OF_SQUARES:
        return (
            f"list_reduce(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
            f" p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
        )
    if metric is DistanceMetric.L2:
        return f"sqrt({duckdb_distance_sql(a, b, DistanceMetric.SUM_OF_SQUARES)})"
    if metric is DistanceMetric.INNER_PRODUCT:
        return (
            f"list_reduce(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
            f" p -> p[1] * p[2]), (x, y) -> x + y)"
        )
    if metric is DistanceMetric.COSINE:
        ip = duckdb_distance_sql(a, b, DistanceMetric.INNER_PRODUCT)
        na = f"sqrt(list_reduce(list_transform({a}::DOUBLE[], x -> x * x), (x, y) -> x + y))"
        nb = f"sqrt(list_reduce(list_transform({b}::DOUBLE[], x -> x * x), (x, y) -> x + y))"
        return f"(1.0 - ({ip}) / (({na}) * ({nb})))"
    raise ValueError(f"unsupported metric: {metric}")
