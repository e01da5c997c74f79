"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (the GPT-3/Llama pretraining
hygiene step — eval answers leaking into training data inflate scores).

Scale posture (100 TB corpus, MB-scale eval set):
- the eval side reduces to a DISTINCT set of n-gram strings — benchmarks
  are tiny, so this set is broadcast; the corpus side is a map-only
  explode + broadcast hash join, no corpus shuffle;
- the only shuffle is the final per-doc count, which is map-side
  combinable on ``doc_id`` (grams are already distinct per doc, so the
  partial aggregate is a plain count).

Reference parity: the reference has no decontamination in-tree; this is
part of the LLM-training-data extension the engine adds on top of the
reference's operator set (SURVEY §2's "beyond the reference" block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.text import (
    shingles_from_tokens,
    tokens,
)


def _doc_grams(df: DataFrame, id_col: str | None, text_col: str, n: int) -> DataFrame:
    """Exploded distinct-per-doc n-grams.

    The token regex stays ONE evaluation per row with no exchange —
    Catalyst keeps the tokens() Project below the Generate (verified in
    the optimized plan: the shingle lambda references ``__t``, not the
    regex).  The repartition exists only to spread a source narrower
    than the cluster (the single-file test fixture); a 100 TB input
    already arrives wide, and an unconditional round-robin here was a
    full corpus shuffle the module docstring claims not to pay."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    ids = [F.col(id_col)] if id_col else []
    toks = df.select(*ids, tokens(text_col).alias("__t"))
    if df.rdd.getNumPartitions() < target:
        toks = toks.repartition(target)
    return toks.select(
        *ids, F.explode(shingles_from_tokens("__t", n)).alias("gram")
    )


def eval_ngram_set(eval_df: DataFrame, text_col: str = "text", n: int = 4) -> DataFrame:
    """Distinct word n-grams over the eval set — the broadcast probe side."""
    return _doc_grams(eval_df, None, text_col, n).distinct()


def ngram_overlap(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    threshold: int = 1,
) -> DataFrame:
    """Per-train-doc count of distinct n-grams shared with the eval set.

    Returns ``(id_col, n_overlap, contaminated)`` for docs with ≥1 shared
    gram; ``contaminated`` applies the count threshold.  ``word_shingles``
    is distinct-per-doc, so after the explode each (doc, gram) occurs once
    and the per-doc aggregate is a plain count (map-side combinable).
    """
    ev = eval_ngram_set(eval_df, text_col, n)
    tr = _doc_grams(train_df, id_col, text_col, n)
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
        .select(
            id_col,
            F.col("n_overlap").cast("long").alias("n_overlap"),
            (F.col("n_overlap") >= threshold).alias("contaminated"),
        )
    )


def embedding_overlap(
    train_df: DataFrame,
    eval_df: DataFrame,
    max_distance: float,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    metric: str = "sum_of_squares",
    nprobe: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """SEMANTIC decontamination: flag training rows whose embedding sits
    within ``max_distance`` of ANY eval-set embedding — the companion of
    :func:`ngram_overlap` for paraphrased/translated eval leakage that
    shares no surface n-grams (the reason modern decontamination runs an
    embedding pass beside the lexical one).

    Returns ``(id_col, eval_id, distance, contaminated)`` — one row per
    flagged training doc with its NEAREST offending eval row
    (deterministic (distance, id) tie-break).

    Scale posture (100 TB train, MB-scale eval): a ``knn_join`` with the
    EVAL side as the right/indexed table — centroids train on the tiny
    eval set (bounded driver k-means, hash-ordered so results are
    reproducible), the training corpus routes through broadcast
    centroids and cogroups against eval members, so the only train-side
    shuffle is the nprobe-way routed repartition; no corpus pairs, no
    index build.

    DEFAULT = EXHAUSTIVE probing (``nprobe=None`` → every eval cell):
    decontamination is a hygiene step whose one failure mode is the
    silent false negative, and a leak routed to an unprobed cell is
    exactly that — so approximation is OPT-IN (pass a small ``nprobe``
    to trade exhaustiveness for routed-scan cost).  The eval side is
    MB-scale, so even full probe is one broadcast matmul per train
    batch; the train-side shuffle grows with the probe count.
    """
    from tiledb_vector_search_spark.functions.distance import DistanceMetric
    from tiledb_vector_search_spark.operators.knn import knn_join
    from tiledb_vector_search_spark.schemas import integral_id_col

    m = DistanceMetric(metric)
    train = train_df.select(
        integral_id_col(train_df, id_col, "embedding_overlap").alias(
            "__tid"
        ),
        F.col(vector_col).alias("__v"),
    )
    ev = eval_df.select(
        integral_id_col(eval_df, id_col, "embedding_overlap eval").alias(
            "__eid"
        ),
        F.col(vector_col).alias("__v"),
    )
    if nprobe is None:
        # exhaustive: knn_join clamps nprobe to the trained cell count
        nprobe = 2**31 - 1
    nearest = knn_join(
        train,
        ev,
        k=1,
        nprobe=nprobe,
        partitions=partitions,
        metric=m,
        left_id_col="__tid",
        right_id_col="__eid",
        vector_col="__v",
        strategy="expr",
    )
    cond = (
        F.col("distance") <= max_distance
        if m.ascending
        else F.col("distance") >= max_distance
    )
    return nearest.where(cond).select(
        F.col("__tid").alias(id_col),
        F.col("__eid").alias("eval_id"),
        "distance",
        F.lit(True).alias("contaminated"),
    )
