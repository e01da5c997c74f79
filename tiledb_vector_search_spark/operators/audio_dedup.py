"""Acoustic-fingerprint audio near-duplicate detection.

The audio member of the perceptual dedup family (image twin:
`operators/image_dedup.py`): byte-exact hashing misses re-encoded,
re-leveled, or slightly-noised copies of the same recording.  The
classic remedy (Haitsma-Kalker / chromaprint family) fingerprints
TEMPORAL DIFFERENCES OF LOG BAND ENERGIES — stable under gain changes
and small noise — and near-dups fall within a few hamming bits.

Fingerprint (64 bits, deterministic pure numpy, shared with tests):
decode WAV → mono → 33 equal frames → per frame, FFT magnitude split
into a low and a high band → log energies → bit (2i+band) set iff
band's log energy RISES from frame i to i+1.  Gain scaling multiplies
every energy by a constant, leaving all differences unchanged.

Spark shape: one `mapInPandas` pass emits a single int64 per blob (the
corpus audio never shuffles); candidate pairs come from the shared
pigeonhole band-join (`operators/hamming.py`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_FP_BITS = 64
_FRAMES = 33  # 32 temporal differences × 2 bands


def audio_fingerprint_samples(mono: np.ndarray) -> int:
    """64-bit fingerprint of a mono sample vector (float, any length ≥
    _FRAMES).  Pure-numpy reference shared by the kernel and tests."""
    x = np.asarray(mono, dtype=np.float64).ravel()
    if len(x) < _FRAMES:
        x = np.pad(x, (0, _FRAMES - len(x)))
    n = len(x) // _FRAMES
    frames = x[: n * _FRAMES].reshape(_FRAMES, n)
    mag = np.abs(np.fft.rfft(frames, axis=1))
    half = mag.shape[1] // 2 or 1
    lo = np.log1p(np.sum(mag[:, :half] ** 2, axis=1))
    hi = np.log1p(np.sum(mag[:, half:] ** 2, axis=1))
    out = 0
    for i in range(_FRAMES - 1):
        if lo[i + 1] > lo[i]:
            out |= 1 << (2 * i)
        if hi[i + 1] > hi[i]:
            out |= 1 << (2 * i + 1)
    return out - (1 << 64) if out >= (1 << 63) else out


def audio_fingerprint(
    df: DataFrame, blob_col: str = "audio", id_col: str = "external_id"
) -> DataFrame:
    """(id, fingerprint): one Arrow pass decoding WAV blobs; undecodable
    blobs yield NULL (kept for decode-failure audits)."""
    from tiledb_vector_search_spark.objects.codecs import decode_wav

    schema = f"{id_col} long, fingerprint long"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fps = [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if pd.isna(i):
                    continue  # NULL id: int() would kill the task
                ids.append(int(i))
                try:
                    x, _rate = decode_wav(bytes(blob))
                    fps.append(audio_fingerprint_samples(x.mean(axis=1)))
                except Exception:
                    fps.append(None)
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def audio_near_duplicates(
    df: DataFrame,
    blob_col: str = "audio",
    id_col: str = "external_id",
    max_hamming: int = 8,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming): acoustically-near pairs via
    the shared pigeonhole band-join over the 64-bit fingerprint."""
    from tiledb_vector_search_spark.operators.hamming import (
        hamming_near_pairs,
    )

    fps = audio_fingerprint(df, blob_col, id_col).where(
        F.col("fingerprint").isNotNull()
    )
    return hamming_near_pairs(
        fps, AUDIO_FP_BITS, max_hamming, id_col=id_col, hash_col="fingerprint"
    )
