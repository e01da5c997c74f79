"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the deterministic IVF
route-and-search pipeline) at sf0.001.  ``queries()`` exposes the
CURATED driver-verification set from
:mod:`tiledb_vector_search_spark.queries`; ``oracle_sql()`` the matching
DuckDB SQL for every exported entry.

The driver verifies only the FIRST 50 ``queries()`` entries, so the
exported REGISTRY is capped at exactly 50 canonical components (every
index/DML/LLM flagship, each with an oracle).  Pure regression-twins of
driver-verified entries live in ``FULL_REGISTRY`` and get the identical
oracle comparison in pytest (tests/test_entry.py) instead of a driver
CORRECTNESS row.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tiledb_vector_search_spark.queries import ORACLE_SQL, REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["ivf_partition_search"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLE_SQL)
