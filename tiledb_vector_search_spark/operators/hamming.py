"""Shared pigeonhole band-join: pairs within a hamming radius of an
integer hash column.

The candidate plan behind every hamming-space near-dup operator (text
simhash, image pHash, audio fingerprints): split the hash into
``max_hamming + 1`` disjoint chunks — a pair within the radius must
agree EXACTLY on at least one chunk — equi-join per chunk, dedup, and
verify with ``bit_count(xor)``.  All-pairs work happens only inside
band buckets; the shuffle is keyed on (chunk, chunk-value), never on
the corpus payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming_near_pairs(
    hashes: DataFrame,
    bits: int,
    max_hamming: int,
    id_col: str = "external_id",
    hash_col: str = "hash",
) -> DataFrame:
    """(id_a, id_b, hamming) with hamming ≤ ``max_hamming``; ``hashes``
    is one long hash per id.  Sound for any chunking with ≥
    ``max_hamming + 1`` chunks (orphan high bits only make chunks
    cleaner, never dirtier)."""
    chunks = max_hamming + 1
    chunk_bits = max(1, bits // chunks)

    def _key(c: int):
        shifted = (
            F.col(hash_col)
            if c == 0
            else F.shiftright(F.col(hash_col), c * chunk_bits)
        )
        if chunk_bits >= 64:
            # single chunk spanning the whole long hash (max_hamming=0):
            # the key IS the hash — (1<<64)-1 would overflow LongType
            return shifted
        return shifted.bitwiseAND(F.lit((1 << chunk_bits) - 1))

    banded = hashes.select(
        id_col,
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        _key(c).alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "__h", F.col("cc.chunk"), F.col("cc.key"))
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
            F.col("a.__h").alias("h_a"),
            F.col("b.__h").alias("h_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )
