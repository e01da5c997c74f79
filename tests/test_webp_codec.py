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

    # lossy VP8 now decodes NATIVELY — an empty VP8 chunk is a
    # truncated stream, not a codec gap
    with pytest.raises(ValueError, match="too short"):
        decode_webp(
            b"RIFF" + struct.pack("<I", 12) + b"WEBPVP8 "
            + struct.pack("<I", 0)
        )
    # animation decodes natively now; an ANIM chunk with no ANMF
    # frames (and no still image) is a malformed container
    with pytest.raises(ValueError, match="no image chunk"):
        decode_webp(
            b"RIFF" + struct.pack("<I", 12) + b"WEBPANIM"
            + struct.pack("<I", 0)
        )
    with pytest.raises(ValueError, match="not a WEBP"):
        decode_webp(b"garbage....")
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00nonsense")


def test_vp8x_container_with_vp8l_payload():
    """Extended (VP8X) containers whose image chunk is VP8L decode
    natively (as do lossy VP8, ALPH, and animation)."""
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
    with pytest.raises(ValueError, match="no image chunk"):
        decode_webp(anim)


def test_webp_bomb_guard():
    """Header dims are untrusted: a tiny blob claiming a 16k×16k canvas
    is refused before any allocation.  The VP8L ceiling is deliberately
    much lower than PNG's — the symbol loop is pure Python, so the guard
    bounds CPU time, not just memory — and raises the PIL hint
    (NotImplementedError) so callers treat it as a codec handoff, not a
    corrupt blob."""
    bw = BitWriter()
    bw.write((1 << 14) - 1, 14)
    bw.write((1 << 14) - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    with pytest.raises(NotImplementedError, match="VP8L_MAX_PIXELS"):
        decode_vp8l(b"\x2f" + bw.finish())


def test_vp8l_cpu_guard_is_below_png_guard():
    from tiledb_vector_search_spark.objects.codecs import PNG_MAX_PIXELS
    from tiledb_vector_search_spark.objects.webp import VP8L_MAX_PIXELS

    # a 5000×5000 webp (legal for PNG) must hit the VP8L CPU guard
    assert VP8L_MAX_PIXELS < PNG_MAX_PIXELS
    bw = BitWriter()
    bw.write(5000 - 1, 14)
    bw.write(5000 - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    with pytest.raises(NotImplementedError, match="PIL"):
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


def test_max_symbol_beyond_alphabet_rejected():
    """libwebp's ReadHuffmanCodeLengths errors when the transmitted
    max_symbol exceeds the alphabet size; match that strictness (a
    reference decoder would reject the stream, so silently tolerating
    it is a parity divergence)."""
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta huffman
    # green code: full (non-simple) code with a transmitted max_symbol
    # far beyond the 280-symbol alphabet
    bw.write(0, 1)  # not simple
    bw.write(12 - 4, 4)  # 12 code-length-code lengths
    lens = {2: 1, 11: 1}  # symbols 0 and 8 at length 1 (complete)
    for i in range(12):
        bw.write(lens.get(i, 0), 3)
    bw.write(1, 1)  # use transmitted max_symbol
    bw.write(7, 3)  # length_nbits = 2 + 2*7 = 16
    bw.write(65000, 16)  # max_symbol = 65002 >> 280
    with pytest.raises(ValueError, match="max_symbol"):
        decode_vp8l(b"\x2f" + bw.finish())


def test_hand_built_meta_huffman_stream():
    """8×1 image with the meta-Huffman path: huff_bits=2 → two 4-px
    tiles, a 2×1 meta image assigning group 0 to the left tile and
    group 1 to the right; each group's codes are single-symbol so the
    expected pixels are fully determined by group routing alone."""
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta huffman present
    bw.write(0, 3)  # huff_bits − 2 = 0 → 4-px tiles → 2×1 meta image
    # --- meta entropy image (no recursion): green = group id ---
    bw.write(0, 1)  # meta image: no color cache
    # green: simple 2-symbol code over {0, 1}
    bw.write(1, 1)  # simple
    bw.write(1, 1)  # two symbols
    bw.write(0, 1)  # 1-bit first symbol
    bw.write(0, 1)  # s0 = 0
    bw.write(1, 8)  # s1 = 1
    _single(bw, 0)  # red (group id high byte stays 0)
    _single(bw, 0)  # blue
    _single(bw, 0)  # alpha
    _single(bw, 0)  # distance
    bw.write_code(0, 1)  # meta pixel 0 → group 0
    bw.write_code(1, 1)  # meta pixel 1 → group 1
    # --- group 0: literal (a=255, r=1, g=10, b=2), zero bits/pixel ---
    _single(bw, 10)
    _single(bw, 1)
    _single(bw, 2)
    _single(bw, 255)
    _single(bw, 0)
    # --- group 1: literal (a=255, r=3, g=20, b=4) ---
    _single(bw, 20)
    _single(bw, 3)
    _single(bw, 4)
    _single(bw, 255)
    _single(bw, 0)
    out = decode_vp8l(b"\x2f" + bw.finish())
    assert out.shape == (1, 8, 4)
    for x in range(4):
        assert tuple(out[0, x]) == (1, 10, 2, 255), (x, out[0, x])
    for x in range(4, 8):
        assert tuple(out[0, x]) == (3, 20, 4, 255), (x, out[0, x])


# --- scalar spec ports (independent per-pixel re-implementations of the
# two vectorized inverse transforms, used as differential oracles) ------


def _scalar_inverse_predictor(argb, modes, bits):
    """Plain per-pixel port of spec §4.2.1 — no run/tile vectorization,
    no cumsum tricks; TR addressing is scan-order pos−width+1."""
    h, w, _ = argb.shape
    px = argb.astype(np.int64)

    def avg2(a, b):
        return [(a[c] + b[c]) >> 1 for c in range(4)]

    def clamp(v):
        return min(255, max(0, v))

    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = [255, 0, 0, 0]  # opaque black, [a, r, g, b]
            elif y == 0:
                pred = list(px[0, x - 1])
            elif x == 0:
                pred = list(px[y - 1, 0])
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = list(px[y, x - 1])
                T = list(px[y - 1, x])
                TL = list(px[y - 1, x - 1])
                # scan-order TR: pixel at pos − w + 1
                TR = list(px[y - 1, x + 1]) if x + 1 < w else list(px[y, 0])
                if mode == 0:
                    pred = [255, 0, 0, 0]
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:  # Select
                    pL = sum(abs(T[c] - TL[c]) for c in range(4))
                    pT = sum(abs(L[c] - TL[c]) for c in range(4))
                    pred = L if pL < pT else T
                elif mode == 12:  # ClampAddSubtractFull
                    pred = [clamp(L[c] + T[c] - TL[c]) for c in range(4)]
                elif mode == 13:  # ClampAddSubtractHalf
                    pred = []
                    for c in range(4):
                        ave = (L[c] + T[c]) >> 1
                        d = ave - TL[c]
                        # C division truncates toward zero
                        half = d // 2 if d >= 0 else -((-d) // 2)
                        pred.append(clamp(ave + half))
                else:
                    raise ValueError(mode)
            px[y, x] = [(int(px[y, x, c]) + pred[c]) & 0xFF for c in range(4)]
    return px.astype(np.uint8)


def _scalar_inverse_color_transform(argb, elements, bits):
    """Plain per-pixel port of the inverse color transform."""
    h, w, _ = argb.shape
    out = argb.copy()

    def s8(v):
        v = int(v) & 0xFF
        return v - 256 if v >= 128 else v

    for y in range(h):
        for x in range(w):
            cte = int(elements[y >> bits, x >> bits])
            g2r = s8(cte & 0xFF)
            g2b = s8((cte >> 8) & 0xFF)
            r2b = s8((cte >> 16) & 0xFF)
            g = s8(out[y, x, 2])
            r = (int(out[y, x, 1]) + ((g2r * g) >> 5)) & 0xFF
            rs = s8(r)
            b = (
                int(out[y, x, 3]) + ((g2b * g) >> 5) + ((r2b * rs) >> 5)
            ) & 0xFF
            out[y, x, 1] = r
            out[y, x, 3] = b
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("bits", [1, 2, 4])
def test_inverse_predictor_matches_scalar_spec_port(seed, bits):
    """Differential: the vectorized _inverse_predictor (run splitting,
    cumsum lanes, TR wrap at the rightmost column, left-dependent
    scalar fallback) must agree with a naive per-pixel spec port on
    random residuals across ALL 14 modes and odd shapes."""
    from tiledb_vector_search_spark.objects.webp import _inverse_predictor

    rng = np.random.default_rng(seed)
    # odd sizes on purpose: exercise partial tiles + rightmost-column TR
    h, w = int(rng.integers(2, 13)), int(rng.integers(2, 13))
    mh, mw = -(-h // (1 << bits)), -(-w // (1 << bits))
    residuals = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    modes = rng.integers(0, 14, size=(mh, mw), dtype=np.int64)
    got = residuals.copy()
    _inverse_predictor(got, modes, bits)
    exp = _scalar_inverse_predictor(residuals.copy(), modes, bits)
    assert (got == exp).all(), (
        f"mismatch at {np.argwhere(got != exp)[:4]} modes=\n{modes}"
    )


def test_inverse_predictor_every_mode_in_isolation():
    """One tile per mode on a 3-row canvas so every mode runs both with
    and without valid top neighbors."""
    from tiledb_vector_search_spark.objects.webp import _inverse_predictor

    rng = np.random.default_rng(99)
    bits = 1  # 2×2 tiles
    h, w = 6, 28  # 3×14 tiles → every mode appears in 3 tile rows
    modes = np.tile(np.arange(14, dtype=np.int64), (3, 1))
    residuals = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    got = residuals.copy()
    _inverse_predictor(got, modes, bits)
    exp = _scalar_inverse_predictor(residuals.copy(), modes, bits)
    assert (got == exp).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("bits", [1, 3])
def test_inverse_color_transform_matches_scalar_spec_port(seed, bits):
    from tiledb_vector_search_spark.objects.webp import (
        _inverse_color_transform,
    )

    rng = np.random.default_rng(seed + 7)
    h, w = int(rng.integers(2, 17)), int(rng.integers(2, 17))
    mh, mw = -(-h // (1 << bits)), -(-w // (1 << bits))
    argb = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    elements = rng.integers(0, 2**24, size=(mh, mw), dtype=np.uint32)
    got = argb.copy()
    _inverse_color_transform(got, elements, bits)
    exp = _scalar_inverse_color_transform(argb, elements, bits)
    assert (got == exp).all()
