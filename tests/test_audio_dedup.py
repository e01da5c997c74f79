"""Audio fingerprint near-dup: kernel parity, gain invariance, banding."""

from __future__ import annotations

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.codecs import encode_wav
from tiledb_vector_search_spark.operators.audio_dedup import (
    audio_fingerprint,
    audio_fingerprint_samples,
    audio_near_duplicates,
)


def _tone_mix(rng, n=4096, rate=8000):
    t = np.arange(n) / rate
    f1, f2 = rng.uniform(100, 900), rng.uniform(1200, 3200)
    env = np.linspace(0.2, 1.0, n) ** rng.uniform(0.5, 2.0)
    x = env * (0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t))
    return 0.8 * x / np.max(np.abs(x))


@pytest.fixture(scope="module")
def clips(spark):
    rng = np.random.default_rng(5)
    rows, samples = [], {}
    for i in range(16):
        x = _tone_mix(rng)
        rows.append((i, bytearray(encode_wav(x, 8000))))
        samples[i] = x
        if i % 4 == 0:
            # near-copy: mild noise + 0.7x gain (re-encode-ish change)
            near = np.clip(
                0.7 * x + rng.normal(0, 0.004, len(x)), -1.0, 1.0
            )
            rows.append((100 + i, bytearray(encode_wav(near, 8000))))
            samples[100 + i] = near
    df = spark.createDataFrame(rows, "external_id long, audio binary")
    return df, samples


def test_fingerprint_kernel_matches_reference(spark, clips):
    """Kernel == reference on the DECODED samples (the 16-bit PCM
    round-trip quantizes, so the reference runs on re-decoded audio)."""
    from tiledb_vector_search_spark.objects.codecs import decode_wav

    df, samples = clips
    got = {r.external_id: r.fingerprint for r in audio_fingerprint(df).collect()}
    assert set(got) == set(samples)
    for i, x in samples.items():
        decoded, _ = decode_wav(encode_wav(x, 8000))
        assert got[i] == audio_fingerprint_samples(decoded.mean(axis=1)), i


def test_fingerprint_gain_invariant():
    """Scaling the signal leaves the fingerprint unchanged (log-energy
    DIFFERENCES are the bits)."""
    rng = np.random.default_rng(9)
    x = _tone_mix(rng)
    assert audio_fingerprint_samples(x) == audio_fingerprint_samples(0.25 * x)


def test_audio_near_duplicates_matches_bruteforce(spark, clips):
    from tiledb_vector_search_spark.objects.codecs import decode_wav

    df, samples = clips
    max_h = 8
    fp = {}
    for i, x in samples.items():
        decoded, _ = decode_wav(encode_wav(x, 8000))
        fp[i] = audio_fingerprint_samples(decoded.mean(axis=1)) & ((1 << 64) - 1)
    ids = sorted(fp)
    want = {
        (a, b, bin(fp[a] ^ fp[b]).count("1"))
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= max_h
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in audio_near_duplicates(df, max_hamming=max_h).collect()
    }
    assert got == want
    planted = {(i, 100 + i) for i in samples if i < 100 and 100 + i in samples}
    found = {(a, b) for a, b, _ in got}
    assert sum(1 for p in planted if p in found) >= int(0.75 * len(planted))


def test_undecodable_audio_yields_null(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"junk")),
         (1, bytearray(encode_wav(np.zeros(100), 8000)))],
        "external_id long, audio binary",
    )
    rows = {r.external_id: r.fingerprint for r in audio_fingerprint(df).collect()}
    assert rows[0] is None and rows[1] is not None
