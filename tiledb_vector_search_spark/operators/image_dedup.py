"""Perceptual-hash (pHash) image near-duplicate detection.

The image-side member of the dedup family (`operators/dedup.py`): exact
byte-hash dedup misses re-encoded / slightly-noised copies of the same
picture, which dominate crawled image corpora.  The classic remedy is a
64-bit DCT perceptual hash — visually-similar images land within a few
hamming bits — and then the SAME pigeonhole band-join machinery the
text simhash path uses.

Reference status: the reference has no image dedup (its object pipeline
embeds images for ANN); this is part of the LLM-training-data operator
set the engine adds.  The decode step uses the dependency-free netpbm
codec (`objects/codecs.py`) — the same import-try seam real JPEG/PNG
decoding would plug into via PIL.

Spark shape (100 TB): hashing is one `mapInPandas` pass over the binary
column (decode → 32×32 area-mean resize → 2D DCT-II → top-left 8×8
sans DC → median threshold), emitting ONE int64 per image — the corpus
bytes never shuffle.  Candidate generation bands the 64-bit hash into
``max_hamming+1`` chunks (a pair within the radius must agree exactly
on ≥1 chunk), equi-joins per chunk, and verifies with
``bit_count(xor)`` — all-pairs work only inside band buckets, the LSH
contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PHASH_BITS = 64
_RESIZE = 32
_DCT_KEEP = 8


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n × n)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= 1.0 / np.sqrt(2)
    return m * np.sqrt(2.0 / n)


def phash64_pixels(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of a grayscale pixel matrix (any shape).

    Area-mean resize to 32×32 → orthonormal 2D DCT-II → top-left 8×8
    block without the DC term → bit i set iff coefficient i > the
    median of the 63 AC coefficients.  Deterministic pure-numpy
    reference shared by the Spark kernel and the tests.
    """
    x = np.asarray(pixels, dtype=np.float64)
    if x.ndim == 3:
        if x.shape[2] >= 3:  # RGB(A) → Rec.601 luma; alpha ignored
            # ×1000 integer weights: for integer-valued channels the
            # luma plane stays integer-exact, so the integral-image
            # sums below are exact and the hash is deterministic down
            # to the last bit (the threshold is scale-invariant — every
            # DCT coefficient and the median scale together)
            x = 299.0 * x[:, :, 0] + 587.0 * x[:, :, 1] + 114.0 * x[:, :, 2]
        else:
            x = x[:, :, 0]
    elif x.ndim != 2:
        x = x.reshape(x.shape[0], -1)
    # area-mean resize via one integral image (shared helper): all
    # 32×32 bucket means at once instead of 1024 Python-loop submatrix
    # .mean() calls (~6 ms → ~0.2 ms per image; exact for
    # integer-valued planes, so the hash is bit-deterministic)
    from tiledb_vector_search_spark.objects.codecs import area_mean_grid

    re = area_mean_grid(x, _RESIZE)
    d = _dct_matrix(_RESIZE)
    coef = d @ re @ d.T
    block = coef[:_DCT_KEEP, :_DCT_KEEP].ravel()[1:]  # drop DC
    med = np.median(block)
    bits = block > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # map to signed int64 for the LongType column
    return out - (1 << 64) if out >= (1 << 63) else out


def phash64(
    df: DataFrame, blob_col: str = "image", id_col: str = "external_id"
) -> DataFrame:
    """(id, phash): one Arrow pass decoding image blobs and hashing.

    Decode is magic-dispatched (netpbm + native 8-bit PNG; PIL fallback
    for other codecs when installed); RGB(A) images hash their Rec.601
    luma.  Undecodable blobs yield NULL (kept, so callers can audit
    decode failures) — the dedup join drops them.
    """
    from tiledb_vector_search_spark.objects.codecs import decode_image

    schema = f"{id_col} long, phash long"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, hashes = [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if pd.isna(i):
                    continue  # NULL id: int() would kill the task —
                    # per-row isolation covers the id column too
                ids.append(int(i))
                try:
                    hashes.append(phash64_pixels(decode_image(bytes(blob))))
                except Exception:
                    hashes.append(None)
            yield pd.DataFrame({id_col: ids, "phash": hashes})

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def image_near_duplicates(
    df: DataFrame,
    blob_col: str = "image",
    id_col: str = "external_id",
    max_hamming: int = 8,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming): perceptually-near image
    pairs via the shared pigeonhole band-join
    (:func:`operators.hamming.hamming_near_pairs`) over the 64-bit
    pHash."""
    from tiledb_vector_search_spark.operators.hamming import (
        hamming_near_pairs,
    )

    hashes = phash64(df, blob_col, id_col).where(F.col("phash").isNotNull())
    return hamming_near_pairs(
        hashes, PHASH_BITS, max_hamming, id_col=id_col, hash_col="phash"
    )
