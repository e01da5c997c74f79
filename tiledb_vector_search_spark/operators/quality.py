"""Scale-path quality / repetition scoring over a document corpus.

The oracle-facing single-expression forms live in
:mod:`..functions.text` (``repetition_features`` — per-row array
expressions, exactly reproducible in DuckDB).  The array form computes the
2-gram mode by scanning the gram array once per *distinct* gram
(O(distinct·total) per doc) — fine for bounded oracle slices, wrong for
100 TB.  This module is the linear scale path: explode grams once, one
map-side-combinable aggregation keyed by (doc, gram), one by doc.  Shuffle
volume is O(total grams) with small keys, the same posture as the dedup
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.text import (
    all_shingles_from_tokens,
    tokens,
)


def repetition_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc ``top_2gram_frac`` / ``dup_3gram_frac`` via explode + two-level
    aggregation — linear in corpus size, identical values to
    ``functions.text.repetition_features``.

    Tokens are materialized through a ``repartition(id)`` exchange first
    (the ``_shingle_docs`` pattern): Catalyst can't CSE the token regex into
    the shingle lambda, and hash-partitioning by id makes both downstream
    ``groupBy(id, gram)``/``groupBy(id)`` aggregations run map-side.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    toks = df.select(F.col(id_col), tokens(text_col).alias("__t")).repartition(
        target, F.col(id_col)
    )

    def _per_doc(n: int, agg, out: str) -> DataFrame:
        return (
            toks.select(
                F.col(id_col),
                F.explode(all_shingles_from_tokens("__t", n)).alias("g"),
            )
            .groupBy(id_col, "g")
            .agg(F.count("*").alias("c"))
            .groupBy(id_col)
            .agg(F.round(agg.cast("double"), 6).alias(out))
        )

    g2 = _per_doc(2, F.max("c") / F.sum("c"), "top_2gram_frac")
    g3 = _per_doc(
        3, (F.sum("c") - F.count("*")) / F.sum("c"), "dup_3gram_frac"
    )
    # docs shorter than the gram width produce no rows above → fill 0.0.
    # The spine is `toks` (not `df`) so all three sides share the same
    # id-hash partitioning and the left joins need no further exchange.
    return (
        toks.select(id_col)
        .join(g2, id_col, "left")
        .join(g3, id_col, "left")
        .fillna(0.0, subset=["top_2gram_frac", "dup_3gram_frac"])
    )
