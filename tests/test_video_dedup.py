"""Perceptual video near-duplicate detection (operators/video_dedup).

Completes the multimodal dedup family: per-frame 64-bit DCT pHash over
magic-dispatched frame splitting (MJPEG / PNM stream / GIF / WebP) →
temporal pigeonhole band-join → distinct-matched-frame vote.
"""

import importlib.util
import os

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.jpeg import encode_jpeg
from tiledb_vector_search_spark.operators.video_dedup import (
    sample_video_frames,
    video_frame_phashes,
    video_near_duplicates,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "video_phash")


def _texture(seed: int, n: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (n, n)).astype(np.float64)
    k = np.ones(3) / 3.0
    for ax in (0, 1):
        x = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), ax, x
        )
    return ((x - x.min()) / (np.ptp(x) + 1e-9) * 255.0).astype(np.uint8)


def _clip_frames(seed: int, n_frames: int = 6) -> list:
    base = _texture(seed)
    return [np.roll(base, 2 * k, axis=1) for k in range(n_frames)]


def _mjpeg(frames, quality=92) -> bytes:
    return b"".join(encode_jpeg(f, quality=quality) for f in frames)


def test_sample_video_frames_dispatch():
    frames = _clip_frames(1, 3)
    # MJPEG
    got = sample_video_frames(_mjpeg(frames))
    assert len(got) == 3 and got[0].shape == (32, 32)
    # concatenated binary PNM
    from tiledb_vector_search_spark.objects.codecs import encode_pnm

    stream = b"".join(encode_pnm(f) for f in frames)
    got = sample_video_frames(stream)
    assert len(got) == 3 and (got[1] == frames[1]).all()
    # animated GIF (encoder wants RGB frames)
    from tiledb_vector_search_spark.objects.gif import encode_gif

    rgb = [np.stack([f, f, f], axis=2) for f in frames]
    got = sample_video_frames(encode_gif(rgb))
    assert len(got) == 3
    # every_n skips frames
    got = sample_video_frames(_mjpeg(frames), every_n=2)
    assert len(got) == 2  # frames 0 and 2
    with pytest.raises(ValueError, match="container"):
        sample_video_frames(b"\x00\x01\x02\x03garbage")


def test_frame_phashes_and_undecodable_isolation(spark):
    rows = [
        (0, bytearray(_mjpeg(_clip_frames(1, 4)))),
        (1, bytearray(b"not a video at all")),
    ]
    df = spark.createDataFrame(rows, "external_id long, video binary")
    fp = video_frame_phashes(df).collect()
    ok = [r for r in fp if r.external_id == 0]
    bad = [r for r in fp if r.external_id == 1]
    assert len(ok) == 4 and all(r.phash is not None for r in ok)
    assert [r.frame_idx for r in sorted(ok, key=lambda r: r.frame_idx)] == [
        0, 1, 2, 3,
    ]
    assert len(bad) == 1 and bad[0].phash is None  # audit row, join drops


def test_video_near_duplicates_e2e(spark):
    """Re-encode and one-frame trim pair with the original; distinct
    content and a 2-frame overlap stay out at min_frame_matches=3."""
    a = _clip_frames(10, 6)
    rows = [
        (0, bytearray(_mjpeg(a, 92))),            # original
        (1, bytearray(_mjpeg(a, 65))),            # re-encode
        (2, bytearray(_mjpeg(a[1:], 92))),        # one-frame trim
        (3, bytearray(_mjpeg(_clip_frames(77, 6), 92))),  # different clip
        (4, bytearray(_mjpeg(a[:2], 92))),        # 2-frame overlap only
    ]
    df = spark.createDataFrame(rows, "external_id long, video binary")
    out = video_near_duplicates(
        df, max_hamming=8, min_frame_matches=3, temporal_drift=2
    )
    got = {(r.id_a, r.id_b): r.matched_frames for r in out.collect()}
    assert (0, 1) in got and got[(0, 1)] >= 5
    assert (0, 2) in got and got[(0, 2)] >= 4
    assert (1, 2) in got
    assert not any(3 in p or 4 in p for p in got), got


def test_max_frames_caps_output(spark):
    frames = _clip_frames(3, 10)
    df = spark.createDataFrame(
        [(0, bytearray(_mjpeg(frames)))], "external_id long, video binary"
    )
    fp = video_frame_phashes(df, max_frames=4).collect()
    assert len(fp) == 4


def test_band_join_matches_bruteforce_on_fixture(spark):
    """The Spark band-join + vote over the frozen fixture equals the
    brute-force all-pairs computation — band completeness, pytest side
    (the registry twin `video_phash_neardup` runs the identical check
    against DuckDB in the FULL_REGISTRY sweep)."""
    import pandas as pd

    from tiledb_vector_search_spark.operators.video_dedup import (
        video_fingerprint_near_duplicates,
    )

    fp_pd = pd.read_parquet(os.path.join(GOLDEN, "fingerprints.parquet"))
    fp = spark.createDataFrame(fp_pd)
    got = {
        (r.id_a, r.id_b): r.matched_frames
        for r in video_fingerprint_near_duplicates(fp).collect()
    }
    # brute force in numpy
    want = {}
    rows = list(fp_pd.itertuples(index=False))
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.external_id, []).append((r.frame_idx, r.phash))
    vids = sorted(by_vid)
    for i, a in enumerate(vids):
        for b in vids[i + 1 :]:
            m = {
                ka
                for ka, ha in by_vid[a]
                for kb, hb in by_vid[b]
                if abs(ka - kb) <= 2
                and bin((int(ha) ^ int(hb)) & ((1 << 64) - 1)).count("1") <= 8
            }
            if len(m) >= 3:
                want[(a, b)] = len(m)
    assert got == want
    assert want, "fixture lost its planted pairs"


def test_frozen_fingerprints_fresh():
    """Regenerating the fixture must reproduce the committed rows (the
    generator asserts the planted-pair structure at freeze time)."""
    spec = importlib.util.spec_from_file_location(
        "video_phash_generate", os.path.join(GOLDEN, "generate.py")
    )
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    import pandas as pd

    committed = pd.read_parquet(os.path.join(GOLDEN, "fingerprints.parquet"))
    fresh = g.fingerprint_rows()
    assert [tuple(r) for r in committed.itertuples(index=False)] == fresh
