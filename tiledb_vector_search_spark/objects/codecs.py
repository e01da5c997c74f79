"""Dependency-free image/stream codecs for the multimodal pipeline.

Real decoders for the binary netpbm family (PGM ``P5`` grayscale, PPM
``P6`` RGB) and for concatenated-PNM streams — the format ffmpeg emits for
``-f image2pipe -vcodec pnm`` raw video.  Pure numpy, so the multimodal
path has a genuinely working decode stage in this environment (the PIL /
opencv paths in :mod:`tiledb_vector_search_spark.objects.readers` remain
import-try optional).

Reference analogue: ``DirectoryImageReader`` decode
(``object_readers/directory_reader.py:507-643``) and the frame-sampling
video readers; here decode is a byte-layout parser instead of a codec
library call.
"""

from __future__ import annotations

import re

import numpy as np

_MAGIC_CHANNELS = {b"P5": 1, b"P6": 3}

# PNM header: magic, then 2 (P5/P6) sizes + maxval, each separated by
# whitespace/comments; '#' comments run to end of line
_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*([0-9]+)")


def _parse_header(buf: bytes, pos: int) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) for the PNM at ``pos``."""
    magic = buf[pos : pos + 2]
    if magic not in _MAGIC_CHANNELS:
        raise ValueError(f"not a binary PNM (magic {magic!r} at offset {pos})")
    cur = pos + 2
    vals = []
    for _ in range(3):
        m = _TOKEN.match(buf, cur)
        if not m:
            raise ValueError("truncated PNM header")
        vals.append(int(m.group(1)))
        cur = m.end()
    # exactly one whitespace byte separates maxval from pixel data
    if cur >= len(buf) or buf[cur : cur + 1] not in (b"\n", b" ", b"\t", b"\r"):
        raise ValueError("malformed PNM header terminator")
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    return magic, width, height, maxval, cur + 1


def decode_pnm(blob: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """Decode ONE binary PNM image starting at ``pos``.

    Returns ``(pixels, next_pos)`` — pixels shaped (h, w) for P5 or
    (h, w, 3) for P6 — so concatenated streams decode by iterating.
    """
    magic, w, h, _maxval, data = _parse_header(blob, pos)
    ch = _MAGIC_CHANNELS[magic]
    n = w * h * ch
    if data + n > len(blob):
        raise ValueError("truncated PNM pixel data")
    px = np.frombuffer(blob, dtype=np.uint8, count=n, offset=data)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return px.reshape(shape), data + n


def encode_pnm(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, 3) uint8 array as binary PGM/PPM."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        magic = b"P5"
        h, w = px.shape
    elif px.ndim == 3 and px.shape[2] == 3:
        magic = b"P6"
        h, w = px.shape[:2]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {px.shape}")
    return magic + b"\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_pnm_stream(blob: bytes) -> list[np.ndarray]:
    """Split a concatenated-PNM stream (ffmpeg image2pipe) into frames."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(blob):
        frame, pos = decode_pnm(blob, pos)
        frames.append(frame)
    return frames


def sample_pnm_frames(blob: bytes, every_n: int = 1) -> list[np.ndarray]:
    """Every ``every_n``-th frame of a PNM stream (frame-sampling contract:
    decode headers to SKIP pixel payloads of unsampled frames — the stream
    is never fully materialized as arrays)."""
    frames: list[np.ndarray] = []
    pos = 0
    i = 0
    while pos < len(blob):
        if i % every_n == 0:
            frame, pos = decode_pnm(blob, pos)
            frames.append(frame)
        else:
            # header-only parse: skip the pixel payload without decoding
            magic, w, h, _mx, data = _parse_header(blob, pos)
            pos = data + w * h * _MAGIC_CHANNELS[magic]
        i += 1
    return frames
