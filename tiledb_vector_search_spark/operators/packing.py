"""Sequence packing: greedy token-budget binning of documents into
training sequences.

The step between a cleaned corpus and an LLM training run: concatenate
documents into fixed-budget sequences (context windows) without
splitting any document.  Greedy first-fit in a deterministic order —
the classic packing used when document integrity matters (contrast
GPT-style concat-and-cut, which splits documents at window boundaries).

Spark shape, designed for 100 TB:

- ONE narrow projection (id, token_count) — document text never moves;
  token counting is a Catalyst expression on the scan.
- ONE hash shuffle on ``shard = stable_hash64(id) % num_shards``; the
  greedy scan is inherently sequential *within* a sequence stream, so
  the corpus is split into independent shard streams packed in parallel
  (``applyInPandas`` per shard) — same sharding argument as the Vamana
  graph build.  Per-task state is the shard's (id, count) pairs:
  ~16 bytes/row, so even 100M-document shards fit comfortably.
- Deterministic: shard assignment and within-shard order (``id`` asc)
  are both pure functions of the data, so the packing is reproducible
  run-to-run and engine-to-engine — the DuckDB recursive-CTE oracle
  replays the exact recurrence (see ``queries.py`` ``sequence_packing``).

Oversize documents (token_count > max_tokens) need no special case: the
greedy recurrence gives them a singleton sequence naturally (nothing
fits after them, and they fit after nothing).

No reference counterpart (tiledb has no training-data pipeline); this is
part of the LLM-pipeline extension surface (SURVEY §6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.text import (
    stable_hash64,
    token_count_regex,
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    num_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | Column | None = None,
) -> DataFrame:
    """(shard, doc_id, n_tokens, seq): greedy no-split sequence packing.

    ``(shard, seq)`` identifies one training sequence; every sequence's
    token total is ≤ ``max_tokens`` unless it is a single oversize
    document.  ``token_count_col`` overrides the default
    ``token_count_regex(text_col)`` (e.g. a precomputed BPE count).
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1; got {max_tokens}")
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1; got {num_shards}")
    tc = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
        if token_count_col is not None
        else token_count_regex(text_col)
    )
    # string ids are first-class (crawl URLs, content hashes): sharding
    # hashes the string form either way, and the greedy scan only needs
    # a total order, which strings have.  The old unconditional
    # cast("long") turned string ids into NULLs (ANSI off) — every doc
    # packed under doc_id NULL with an arbitrary order.  Fractional ids
    # raise rather than truncate-and-merge.
    id_type = dict(docs.dtypes)[id_col]
    if id_type == "string":
        id_expr, id_sql = F.col(id_col), "string"
    elif id_type in ("tinyint", "smallint", "int", "bigint"):
        id_expr, id_sql = F.col(id_col).cast("long"), "long"
    else:
        raise TypeError(
            f"pack_sequences: id column {id_col!r} has type {id_type}; "
            "expected an integral or string id (a fractional id would "
            "truncate silently, merging distinct documents)"
        )
    narrow = docs.select(
        F.pmod(
            stable_hash64(F.col(id_col).cast("string")), F.lit(num_shards)
        )
        .cast("int")
        .alias("shard"),
        id_expr.alias("doc_id"),
        tc.cast("long").alias("n_tokens"),
    )
    cap = max_tokens

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        counts = pdf["n_tokens"].to_numpy(dtype=np.int64)
        seqs = np.empty(len(counts), dtype=np.int64)
        seq, acc = -1, 0
        for i, n in enumerate(counts):
            if seq < 0 or acc + n > cap:
                seq += 1
                acc = n
            else:
                acc += n
            seqs[i] = seq
        pdf["seq"] = seqs
        return pdf

    return narrow.groupBy("shard").applyInPandas(
        pack, schema=f"shard int, doc_id {id_sql}, n_tokens long, seq long"
    )


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-shard packing efficiency: sequences, fill rate, oversize count.

    ``fill_rate`` = packed tokens / (sequences · max_tokens) — the
    fraction of the training batch that is real data rather than padding.
    """
    per_seq = packed.groupBy("shard", "seq").agg(
        F.sum("n_tokens").alias("seq_tokens"),
        F.count("*").alias("docs"),
    )
    return (
        per_seq.groupBy("shard")
        .agg(
            F.count("*").alias("sequences"),
            F.sum("seq_tokens").alias("tokens"),
            F.sum("docs").alias("docs"),
            F.sum(
                F.when(F.col("seq_tokens") > max_tokens, 1).otherwise(0)
            ).alias("oversize_sequences"),
        )
        .withColumn(
            "fill_rate",
            F.round(
                F.col("tokens") / (F.col("sequences") * F.lit(max_tokens)),
                6,
            ),
        )
    )
