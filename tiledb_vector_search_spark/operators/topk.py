"""Per-group top-k — the engine's core reduction.

The reference's central data structure is ``fixed_min_pair_heap``, a bounded
max-heap keeping the k smallest (score, id) pairs
(``src/include/utils/fixed_min_heap.h:302-441``); every query path reduces
through it.  Spark-first re-expression (SURVEY §2.5):

- :func:`topk_window` — the declarative form: rank window + filter.  One
  shuffle on the group key; Catalyst plans a WindowGroupLimit (Spark ≥3.5
  pushes ``rank <= k`` below the window, so only k rows per group survive
  each task before the shuffle) — this is the partial+final top-k the
  reference hand-rolls when merging distributed results
  (``ivf_flat_index.py:506-525``).

Tie-breaking: (value, id) lexicographic, deterministic — the reference's heap
insertion order is not (SURVEY §7 risk 3), so equality tests compare sets;
our ordering is reproducible and matches the DuckDB oracle's ORDER BY.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_window(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows per group under a total order.

    ``order_cols`` must be a *total* order (include an id tiebreaker) for
    deterministic results.  Spark ≥3.5 rewrites this to WindowGroupLimit:
    each map task keeps only k rows per group before the shuffle, so shuffle
    volume is O(groups·k), not O(rows) — the same partial/final split as the
    reference's per-worker heaps + driver merge.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )
