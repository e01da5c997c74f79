"""Freeze the video frame-fingerprint fixture: deterministic synthetic
MJPEG clips → per-frame 64-bit DCT pHash → ``fingerprints.parquet``.

The decode+hash KERNEL (frame split + DCT, not SQL-expressible) is
pinned by the pytest oracles in ``tests/test_video_dedup.py``; this
fixture freezes its (id, frame_idx, int64) outputs so the temporal
band-join + vote — which IS SQL-expressible — gets a DuckDB oracle row
(``video_phash_neardup``).  Regenerate with::

    PYTHONPATH=/root/repo python tests/golden/video_phash/generate.py

tests/test_video_dedup.py::test_frozen_fingerprints_fresh fails if the
committed bytes drift from what this script produces.

Planted structure (asserted here at freeze time):
- every id < 100 is an 8-frame clip with its own spatial frequency;
- id+1000 (every 4th) is a LOWER-QUALITY RE-ENCODE of the same frames
  (must pair, aligned frames);
- id+2000 (every 6th) is a one-frame TRIM (frames 1..7 → indices 0..6:
  must pair through the temporal drift window);
- id+3000 (id 1 only) shares just TWO frames — must stay OUT at
  ``min_frame_matches=3`` (vote threshold evidence).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_BASE = 12
N_FRAMES = 8
SIZE = 32


_TEXTURES: dict[int, np.ndarray] = {}


def _texture(i: int) -> np.ndarray:
    """Per-clip smoothed random texture — a rich DCT spectrum, so the
    median-threshold pHash is stable under re-encoding (pure sinusoids
    have degenerate spectra whose hash bits flip on codec noise)."""
    if i not in _TEXTURES:
        rng = np.random.default_rng(100 + i)
        x = rng.integers(0, 256, (SIZE, SIZE)).astype(np.float64)
        k = np.ones(3) / 3.0
        for ax in (0, 1):
            x = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), ax, x
            )
        x = (x - x.min()) / (np.ptp(x) + 1e-9) * 255.0
        _TEXTURES[i] = x
    return _TEXTURES[i]


def _frame(i: int, k: int) -> np.ndarray:
    """Frame k of clip i: the clip texture panned 2px per frame —
    adjacent frames perceptually distinct (hamming ~16-20), re-encodes
    of the same frame nearly identical (hamming ≤ 2), clips far apart
    (hamming ~28)."""
    return np.roll(_texture(i), 2 * k, axis=1).astype(np.uint8)


def _mjpeg(frames: list[np.ndarray], quality: int) -> bytes:
    from tiledb_vector_search_spark.objects.jpeg import encode_jpeg

    return b"".join(encode_jpeg(f, quality=quality) for f in frames)


def corpus() -> list[tuple[int, bytes]]:
    clips: list[tuple[int, bytes]] = []
    for i in range(N_BASE):
        frames = [_frame(i, k) for k in range(N_FRAMES)]
        clips.append((i, _mjpeg(frames, 92)))
        if i % 4 == 0:
            clips.append((1000 + i, _mjpeg(frames, 65)))
        if i % 6 == 0:
            clips.append((2000 + i, _mjpeg(frames[1:], 92)))
    # two-frame overlap: below the vote threshold
    clips.append(
        (3001, _mjpeg([_frame(1, 0), _frame(1, 1)], 92))
    )
    return clips


def fingerprint_rows() -> list[tuple[int, int, int]]:
    from tiledb_vector_search_spark.operators.image_dedup import (
        phash64_pixels,
    )
    from tiledb_vector_search_spark.operators.video_dedup import (
        sample_video_frames,
    )

    rows: list[tuple[int, int, int]] = []
    for vid, blob in corpus():
        for k, frame in enumerate(sample_video_frames(blob)):
            h = int(np.int64(np.uint64(phash64_pixels(frame))))
            rows.append((vid, k, h))
    return rows


def _assert_planted(rows) -> None:
    """Freeze-time check: the brute-force vote over the fixture has the
    planted pairs in and the distractors out."""
    import collections

    by_vid = collections.defaultdict(list)
    for vid, k, h in rows:
        by_vid[vid].append((k, h))
    vids = sorted(by_vid)

    def matched(a, b):
        n = set()
        for ka, ha in by_vid[a]:
            for kb, hb in by_vid[b]:
                if abs(ka - kb) <= 2 and bin(
                    (ha ^ hb) & ((1 << 64) - 1)
                ).count("1") <= 8:
                    n.add(ka)
        return len(n)

    pairs = {
        (a, b): matched(a, b)
        for ai, a in enumerate(vids)
        for b in vids[ai + 1 :]
    }
    hits = {p for p, m in pairs.items() if m >= 3}
    for i in range(N_BASE):
        if i % 4 == 0:
            assert (i, 1000 + i) in hits, f"re-encode {i} missed"
        if i % 6 == 0:
            assert (i, 2000 + i) in hits, f"trim {i} missed"
    assert not any(3001 in p for p in hits), "2-frame overlap leaked in"
    base_hits = {p for p in hits if p[0] < 100 and p[1] < 100}
    assert not base_hits, f"distinct clips collided: {base_hits}"


def main() -> None:
    rows = fingerprint_rows()
    _assert_planted(rows)
    table = pa.table(
        {
            "external_id": pa.array([r[0] for r in rows], pa.int64()),
            "frame_idx": pa.array([r[1] for r in rows], pa.int32()),
            "phash": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = os.path.join(os.path.dirname(__file__), "fingerprints.parquet")
    pq.write_table(table, out, compression="snappy")
    print(f"wrote {out}: {table.num_rows} rows, {len(set(r[0] for r in rows))} clips")


if __name__ == "__main__":
    main()
