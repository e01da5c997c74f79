"""VP8L (lossless webp) codec: round-trips + hand-built spec-side streams.

The encoder emits only the literal/fixed-code path, so decode coverage
of transforms, the color cache, and LZ77 comes from streams constructed
FIELD BY FIELD per the public bitstream spec in these tests, with the
expected pixels derived by hand — the encoder cannot mask a decoder bug
in those paths (the JPEG codec's no-inverse-pair-blindness strategy).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.webp import (
    _DIST_MAP,
    BitWriter,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
)


def _wrap(payload: bytes) -> bytes:
    payload = b"\x2f" + payload
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _single(bw: BitWriter, symbol: int) -> None:
    """Simple prefix code with one symbol (decodes with zero bits)."""
    bw.write(1, 1)
    bw.write(0, 1)
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (5, 7, 3), (8, 8, 4), (16, 3, 3), (2, 2, 4)]
)
def test_round_trip(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    out = decode_webp(encode_vp8l(img))
    if shape[2] == 3:
        exp = np.concatenate(
            [img, np.full(shape[:2] + (1,), 255, np.uint8)], axis=2
        )
    else:
        exp = img
    assert out.dtype == np.uint8 and (out == exp).all()


def test_gray_input_round_trips_as_rgb():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_webp(encode_vp8l(g))
    assert (out[:, :, 0] == g).all() and (out[:, :, 1] == g).all()
    assert (out[:, :, 3] == 255).all()


def test_hand_built_cache_and_lz77_stream():
    """4×1 stream: one literal, an LZ77 copy of length 2 through the 2D
    distance map entry (1,0), then a color-cache reference — all four
    pixels must equal the literal.  Every field below is written per the
    spec's reading rules; the green tree's code lengths are transmitted
    through the full code-length-code machinery including zero-run
    symbol 18."""
    p1 = (0xFF << 24) | (1 << 16) | (2 << 8) | 3  # a=255 r=1 g=2 b=3
    cache_bits = 1
    idx = (0x1E35A7BD * p1 & 0xFFFFFFFF) >> (32 - cache_bits)
    C = 280 + idx  # cache symbol in the green alphabet (282 wide)

    bw = BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta huffman

    # green tree lengths: {2: 2, 257: 2, C: 1} (Kraft ¼+¼+½ = 1).
    # code-length code: lengths {0: 2, 1: 3, 2: 3, 18: 1} → canonical
    # codes 18→0, 0→10, 1→110, 2→111
    bw.write(0, 1)  # not simple
    bw.write(5 - 4, 4)  # num_code_lengths = 5 → order [17, 18, 0, 1, 2]
    for v in (0, 1, 2, 3, 3):
        bw.write(v, 3)
    bw.write(0, 1)  # no explicit max_symbol

    def cl(sym):  # emit one code-length symbol
        bw.write_code({18: 0b0, 0: 0b10, 1: 0b110, 2: 0b111}[sym],
                      {18: 1, 0: 2, 1: 3, 2: 3}[sym])

    def zero_run(n):  # runs of zero lengths via symbols 0 and 18
        while n >= 11:
            take = min(n, 138)
            cl(18)
            bw.write(take - 11, 7)
            n -= take
        for _ in range(n):
            cl(0)

    cl(0); cl(0)           # symbols 0, 1
    cl(2)                  # symbol 2 → length 2
    zero_run(254)          # symbols 3..256
    cl(2)                  # symbol 257 (length prefix code 1) → length 2
    zero_run(C - 258)      # symbols 258..C-1
    cl(1)                  # symbol C → length 1
    zero_run(281 - C)      # trailing zeros up to alphabet 282

    _single(bw, 1)      # red tree: always 1
    _single(bw, 3)      # blue tree: always 3
    _single(bw, 255)    # alpha tree: always 255
    _single(bw, 1)      # distance tree: prefix code 1 → value 2 → map (1,0)

    # pixels: canonical green codes — C→0, 2→10, 257→11
    bw.write_code(0b10, 2)   # literal green=2 (r/b/a zero-bit singles)
    bw.write_code(0b11, 2)   # length code 1 → length 2; distance zero-bit
    bw.write_code(0b0, 1)    # cache hit

    out = decode_vp8l((b"\x2f" + bw.finish()))
    assert out.shape == (1, 4, 4)
    exp = np.array([[1, 2, 3, 255]] * 4, dtype=np.uint8).reshape(1, 4, 4)
    assert (out == exp).all(), out


def test_hand_built_subtract_green_stream():
    """2×1 with the subtract-green transform: stored (r=5, g=10, b=7)
    must decode to r=15, b=17 (green added back mod 256)."""
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman
    _single(bw, 10)   # green
    _single(bw, 5)    # red
    _single(bw, 7)    # blue
    _single(bw, 255)  # alpha
    _single(bw, 0)    # distance
    # both pixels decode with zero bits (all trees single-symbol)
    out = decode_vp8l(b"\x2f" + bw.finish())
    exp = np.array([[[15, 10, 17, 255]] * 2], dtype=np.uint8)
    assert (out == exp).all(), out


def test_hand_built_predictor_left_stream():
    """2×2 with the predictor transform, one block, mode 1 (Left);
    expected pixels hand-propagated through the spec's edge rules
    (top-left predicts opaque black, row 0 predicts L, column 0
    predicts T)."""
    from tiledb_vector_search_spark.objects.webp import _write_fixed8_code

    bw = BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bw.write(2, 3)  # size_bits − 2 = 2 → 16-pixel blocks → 1×1 sub-image
    # sub-image (entropy-coded, no meta bit): mode 1 in the green channel
    bw.write(0, 1)  # no color cache
    _single(bw, 1)    # green = predictor mode 1
    _single(bw, 0)    # red
    _single(bw, 0)    # blue
    _single(bw, 0)    # alpha
    _single(bw, 0)    # distance
    bw.write(0, 1)  # no more transforms
    # main image: residuals as full literals (fixed 8-bit codes)
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman
    _write_fixed8_code(bw, 256 + 24)  # green
    _write_fixed8_code(bw, 256)  # red
    _write_fixed8_code(bw, 256)  # blue
    _write_fixed8_code(bw, 256)  # alpha
    _single(bw, 0)  # distance

    # residuals (a, r, g, b) written green, red, blue, alpha:
    residuals = [
        (0, 5, 6, 7),   # (0,0): + (255,0,0,0)    → (255,5,6,7)
        (0, 1, 1, 1),   # (0,1): + L (255,5,6,7)  → (255,6,7,8)
        (0, 0, 0, 1),   # (1,0): + T (255,5,6,7)  → (255,5,6,8)
        (0, 2, 0, 0),   # (1,1): + L (255,5,6,8)  → (255,7,6,8)
    ]
    for a, r, g, b in residuals:
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(a, 8)
    out = decode_vp8l(b"\x2f" + bw.finish())
    exp = np.array(
        [
            [[5, 6, 7, 255], [6, 7, 8, 255]],
            [[5, 6, 8, 255], [7, 6, 8, 255]],
        ],
        dtype=np.uint8,
    )
    assert (out == exp).all(), out


def test_hand_built_palette_with_bundling():
    """8×1 two-color palette: width_bits=3 packs 8 one-bit indices into
    one green byte (0xAA = alternating), palette entries delta-coded."""
    from tiledb_vector_search_spark.objects.webp import _write_fixed8_code

    e0 = (255, 10, 20, 30)  # a, r, g, b
    e1 = (255, 40, 50, 60)
    delta = tuple((b - a) & 0xFF for a, b in zip(e0, e1))

    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # color indexing
    bw.write(1, 8)  # table size − 1
    # palette entropy image (2×1): literal entries via fixed codes
    bw.write(0, 1)  # no color cache
    _write_fixed8_code(bw, 256 + 24)
    _write_fixed8_code(bw, 256)
    _write_fixed8_code(bw, 256)
    _write_fixed8_code(bw, 256)
    _single(bw, 0)
    for a, r, g, b in (e0, delta):
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        bw.write_code(a, 8)
    bw.write(0, 1)  # no more transforms
    # packed main image: 1×1, single pixel green=0xAA
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman
    _single(bw, 0xAA)  # green
    _single(bw, 0)     # red
    _single(bw, 0)     # blue
    _single(bw, 0)     # alpha
    _single(bw, 0)     # distance
    out = decode_vp8l(b"\x2f" + bw.finish())
    assert out.shape == (1, 8, 4)
    rgba0 = (e0[1], e0[2], e0[3], e0[0])
    rgba1 = (e1[1], e1[2], e1[3], e1[0])
    exp = np.array([[rgba0, rgba1] * 4], dtype=np.uint8)
    assert (out == exp).all(), out


def test_distance_map_invariants():
    """120 unique 2D offsets, dy ∈ [0,7], dx ∈ [−8,8], dy=0 → dx>0 —
    the structural constraints the spec's map satisfies."""
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    for dx, dy in _DIST_MAP:
        assert 0 <= dy <= 8 and -8 <= dx <= 8
        if dy == 0:
            assert dx > 0


def test_container_dispatch_and_errors():
    from tiledb_vector_search_spark.objects.codecs import decode_image

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = encode_vp8l(img)
    out = decode_image(blob)  # magic dispatch hits the native path
    assert (out[:, :, :3] == img).all()

    with pytest.raises(NotImplementedError, match="PIL"):
        decode_webp(
            b"RIFF" + struct.pack("<I", 12) + b"WEBPVP8 "
            + struct.pack("<I", 0)
        )
    with pytest.raises(ValueError, match="not a WEBP"):
        decode_webp(b"garbage....")
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00nonsense")


def test_vp8x_container_with_vp8l_payload():
    """Extended (VP8X) containers whose image chunk is VP8L decode
    natively — only lossy VP8 / animation fall back to PIL."""
    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    plain = encode_vp8l(img)
    # lift the VP8L chunk out and rewrap behind a VP8X header chunk
    vp8l_chunk = plain[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    riff = b"WEBP" + vp8x + vp8l_chunk
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    out = decode_webp(blob)
    assert (out[:, :, :3] == img).all()

    anim = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"ANIM" \
        + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_webp(anim)


def test_webp_bomb_guard():
    """Header dims are untrusted: a tiny blob claiming a 16k×16k canvas
    is refused before any allocation."""
    bw = BitWriter()
    bw.write((1 << 14) - 1, 14)
    bw.write((1 << 14) - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    with pytest.raises(ValueError, match="max-pixels"):
        decode_vp8l(b"\x2f" + bw.finish())


def test_hand_built_color_transform_stream():
    """1×1 with the color transform: cte (g2r=4, g2b=−3, r2b=2) on
    stored (r=10, g=100, b=50) must yield r'=10+(4·100>>5)=22,
    b'=50+(−3·100>>5)+(2·22>>5)=50−10+1=41 — every shift arithmetic,
    hand-derived per spec §4.2.1."""
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)  # transform present
    bw.write(1, 2)  # color transform
    bw.write(0, 3)  # size_bits − 2 = 0 → 4-pixel tiles → 1×1 sub-image
    # sub-image: cte pixel — bytes: b=g2r=4, g=g2b=253(−3), r=r2b=2
    bw.write(0, 1)  # no color cache
    _single(bw, 253)  # green = g2b byte
    _single(bw, 2)    # red = r2b byte
    _single(bw, 4)    # blue = g2r byte
    _single(bw, 0)    # alpha
    _single(bw, 0)    # distance
    bw.write(0, 1)  # no more transforms
    # main image: one literal (a=255, r=10, g=100, b=50)
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman
    _single(bw, 100)  # green
    _single(bw, 10)   # red
    _single(bw, 50)   # blue
    _single(bw, 255)  # alpha
    _single(bw, 0)    # distance
    out = decode_vp8l(b"\x2f" + bw.finish())
    assert out.shape == (1, 1, 4)
    assert tuple(out[0, 0]) == (22, 100, 41, 255), out[0, 0]
