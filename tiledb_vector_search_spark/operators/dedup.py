"""Deduplication operators for LLM training-data pipelines.

Five strategies, all shuffle-architected for 100 TB (each one's join key is
a *hash/bucket*, never the document text, so the heavy shuffle carries small
keys; candidate verification happens only within buckets):

- exact:        md5(raw text) group-by — one shuffle on a 128-bit key.
- fingerprint:  md5(sorted token set) — order/duplication-insensitive exact.
- minhash LSH:  shingle → k minhashes → band buckets → within-bucket pairs →
                (optional) exact-Jaccard verify.  The classic
                shingle→minhash→band→bucket-join pipeline.
- simhash:      per-token hash bit-majority → near-dup via hamming ≤ r on
                band-rotated keys.
- n-gram Jaccard: exact pairwise Jaccard, for bounded candidate sets / small
                tables (the verifier inside LSH at scale).
- embedding cosine: near-dup via vector similarity (reuses the kNN plans).

All SQL-expressible pieces are Catalyst expressions with DuckDB twins in
:mod:`..functions.text`, so every strategy is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.text import (
    doc_fingerprint,
    stable_hash64,
    word_shingles,
)

DEFAULT_NUM_PERM = 16
DEFAULT_BANDS = 4


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, dup_count, min_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
        .where("dup_count > 1")
    )


def fingerprint_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Same-token-set groups (order/duplication-insensitive exact dedup)."""
    return (
        df.select(doc_fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("keep_id"))
        .where("dup_count > 1")
    )


# --- MinHash LSH --------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, minhash array<long>[num_perm]) via salted md5 min-hashing.

    One explode + one groupBy: the shuffle carries (id, perm, hash) longs.
    Docs with fewer than ``shingle_n`` tokens get no signature (dropped,
    like the reference drops empty vectors).
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("__s")
    )
    mins = [
        F.min(stable_hash64(F.col("__s"), salt=f"#p{p}")).alias(f"h{p}")
        for p in range(num_perm)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"h{p}") for p in range(num_perm)]).alias("minhash"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band bucket.

    Band key = md5 of the band's slice of the signature; the self-join is an
    equi-join on (band, bucket) — shuffle on small keys, quadratic blowup
    only within buckets (the LSH contract).
    """
    rows_per_band = num_perm // bands
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("minhash", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bucket") == F.col(f"b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-Jaccard ≥ threshold pairs.

    With ``pairs`` given (e.g. LSH candidates) verifies only those — the
    scale path.  Without, scores all (a < b) pairs — the small-table /
    oracle path.
    """
    docs = df.select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("__sh")
    ).where(F.size("__sh") > 0)
    a = docs.select(
        F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a")
    )
    b = docs.select(
        F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b")
    )
    if pairs is not None:
        cand = pairs.join(F.broadcast(a) if _small(a) else a, "id_a").join(
            F.broadcast(b) if _small(b) else b, "id_b"
        )
    else:
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))).cast(
        "double"
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _small(df: DataFrame) -> bool:
    return False  # broadcast decision left to AQE; hook for future stats


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.8,
    verify: bool = True,
) -> DataFrame:
    """Full LSH dedup: signatures → band buckets → candidates → verify."""
    sigs = minhash_signatures(df, text_col, id_col, num_perm)
    cand = lsh_candidate_pairs(sigs, id_col, num_perm, bands)
    if not verify:
        return cand
    return jaccard_pairs(
        df, cand, text_col, id_col, threshold=threshold
    )


# --- SimHash ------------------------------------------------------------------

def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-doc simhash: bit b set iff Σ_tokens (±1 on token-hash bit b) > 0.

    Pure Catalyst: explode tokens → per-bit conditional sums → reassemble.
    """
    from tiledb_vector_search_spark.functions.text import tokens

    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__w")
    ).withColumn("__h", stable_hash64(F.col("__w")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Small-table path: all-pairs on the (id, simhash) projection — tiny rows.
    Scale path: band the hash into (max_hamming+1) chunks; a pair within the
    radius must match exactly on ≥1 chunk (pigeonhole) → equi-join per chunk.
    """
    s = simhash(df, text_col, id_col, bits)
    chunks = max_hamming + 1
    chunk_bits = bits // chunks
    banded = s.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(
        F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    )
    return cand.select(
        "id_a", "id_b", ham.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


# --- embedding near-dup -------------------------------------------------------

def embedding_near_duplicates(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """(id_a < id_b) pairs with cosine similarity ≥ threshold.

    All-pairs form (oracle path).  At scale, route through an IVF index and
    only compare within probed partitions — see ``IVFFlatIndex`` — or LSH
    on random hyperplanes (simhash of the embedding sign pattern).
    """
    from tiledb_vector_search_spark.functions.distance import cosine_similarity

    a = df.select(F.col(id_col).alias("id_a"), F.col(vector_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vector_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity("va", "vb"), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
