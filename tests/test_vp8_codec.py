"""Lossy VP8 decoder: bool-codec properties, hand-derived streams, and
a bit-exact differential against the system libwebp when present.

Test strategy mirrors the VP8L/JPEG codecs (no inverse-pair blindness):
the minimal encoder produces streams, but the EXPECTED pixels come from
hand derivation or from libwebp's own decode — never from the decoder
under test.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.vp8 import (
    B_PRED,
    BoolDecoder,
    VP8_MAX_PIXELS,
    decode_vp8,
    decode_vp8_yuv,
)
from tiledb_vector_search_spark.objects.vp8_encode import (
    BoolEncoder,
    encode_vp8_frame,
    encode_vp8_lossy_image,
    wrap_webp,
)
from tiledb_vector_search_spark.objects.vp8_tables import (
    AC_QLOOKUP,
    DC_QLOOKUP,
)


def _libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LIB = _libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available"
)


def _lib_encode_rgb(img: np.ndarray, quality: float) -> bytes:
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    h, w = img.shape[:2]
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeRGB(
        img.tobytes(), w, h, w * 3, float(quality), ctypes.byref(out)
    )
    assert n > 0
    blob = ctypes.string_at(out.value, n)
    _LIB.WebPFree(out)
    return blob


def _lib_decode_yuv(blob: bytes):
    _LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _LIB.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    wi, hi = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    s, us = ctypes.c_int(), ctypes.c_int()
    y = _LIB.WebPDecodeYUV(
        blob, len(blob), ctypes.byref(wi), ctypes.byref(hi),
        ctypes.byref(u), ctypes.byref(v), ctypes.byref(s), ctypes.byref(us),
    )
    assert y, "libwebp rejected the stream"
    w, h = wi.value, hi.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Y = np.array(
        [[y[r * s.value + c] for c in range(w)] for r in range(h)],
        dtype=np.uint8,
    )
    U = np.array(
        [[u[r * us.value + c] for c in range(cw)] for r in range(ch)],
        dtype=np.uint8,
    )
    V = np.array(
        [[v[r * us.value + c] for c in range(cw)] for r in range(ch)],
        dtype=np.uint8,
    )
    return Y, U, V


def _vp8_payload(blob: bytes) -> bytes:
    import struct

    pos = 12
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (ln,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            return blob[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    raise ValueError("no VP8 chunk")


# --- boolean codec -----------------------------------------------------------


@pytest.mark.parametrize("seed", range(5))
def test_bool_codec_roundtrip(seed):
    """Randomized (bit, prob) sequences survive encode→decode exactly —
    the big-int encoder is the decoder's exact inverse."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    ops = [
        (int(rng.integers(0, 2)), int(rng.integers(1, 255)))
        for _ in range(n)
    ]
    be = BoolEncoder()
    for b, p in ops:
        be.put(b, p)
    bd = BoolDecoder(be.finish())
    assert [bd.get(p) for _, p in ops] == [b for b, _ in ops]


def test_bool_literals_roundtrip():
    be = BoolEncoder()
    be.put_literal(93, 7)
    be.put_flagged_signed(-5, 4)
    be.put_flagged_signed(0, 6)
    be.put_literal(3, 2)
    bd = BoolDecoder(be.finish())
    assert bd.literal(7) == 93
    assert bd.flagged_signed(4) == -5
    assert bd.flagged_signed(6) == 0
    assert bd.literal(2) == 3


# --- hand-derived streams ----------------------------------------------------


def test_flat_dc_frame_hand_derived():
    """All-zero coefficients, 16×16 DC mode: Y = 128 (no neighbors →
    DC pred 128), U = V = 128, and the BT.601 conversion lands on RGB
    130 — every value derived by hand, no reference decoder."""
    pay = encode_vp8_frame(width=32, height=32)
    y, u, v = decode_vp8_yuv(pay)
    assert (y == 128).all() and (u == 128).all() and (v == 128).all()
    rgba = decode_vp8(pay)
    # r = (298*(128-16) + 409*0 + 128) >> 8 = 130
    assert (rgba[:, :, :3] == 130).all() and (rgba[:, :, 3] == 255).all()


@pytest.mark.parametrize("qi,v", [(4, 8), (20, -5), (60, 3)])
def test_y2_dc_propagation_hand_derived(qi, v):
    """A single Y2 DC coefficient shifts the whole MB uniformly:
    dequant = v·2·dc_q(qi); WHT(dc-only) = (dq+3)>>3 to every subblock
    DC; IDCT(dc-only) adds (that+4)>>3 — the §14.1/14.3/14.4 constants
    composed by hand."""
    pay = encode_vp8_frame(
        width=16, height=16, y_ac_qi=qi, y2_blocks={(0, 0): [v] + [0] * 15}
    )
    y, u, vp = decode_vp8_yuv(pay)
    dq = v * 2 * DC_QLOOKUP[qi]
    wht = (dq + 3) >> 3
    res = (wht + 4) >> 3
    exp = max(0, min(255, 128 + res))
    assert (y == exp).all(), (y[0, 0], exp)
    assert (u == 128).all() and (vp == 128).all()


def test_single_ac_coefficient_matches_scalar_idct_port():
    """One luma AC coefficient through the pipeline vs an independent
    per-column/row scalar port of the §14.4 IDCT written in this test."""
    qi = 10
    coeffs = [0] * 16
    coeffs[1] = 7  # raster position 1
    pay = encode_vp8_frame(
        width=16, height=16, ymode=B_PRED,
        y_blocks={(0, 0, 0, 0): coeffs},
        y_ac_qi=qi,
    )
    y, _, _ = decode_vp8_yuv(pay)

    def scalar_idct(ip):
        c1, c2 = 20091, 35468
        tmp = [0] * 16
        for i in range(4):
            a1 = ip[i] + ip[8 + i]
            b1 = ip[i] - ip[8 + i]
            t1 = (ip[4 + i] * c2) >> 16
            t2 = ip[12 + i] + ((ip[12 + i] * c1) >> 16)
            cc = t1 - t2
            t1 = ip[4 + i] + ((ip[4 + i] * c1) >> 16)
            t2 = (ip[12 + i] * c2) >> 16
            d1 = t1 + t2
            tmp[i] = a1 + d1
            tmp[12 + i] = a1 - d1
            tmp[4 + i] = b1 + cc
            tmp[8 + i] = b1 - cc
        out = [0] * 16
        for i in range(4):
            r = 4 * i
            a1 = tmp[r] + tmp[r + 2]
            b1 = tmp[r] - tmp[r + 2]
            t1 = (tmp[r + 1] * c2) >> 16
            t2 = tmp[r + 3] + ((tmp[r + 3] * c1) >> 16)
            cc = t1 - t2
            t1 = tmp[r + 1] + ((tmp[r + 1] * c1) >> 16)
            t2 = (tmp[r + 3] * c2) >> 16
            d1 = t1 + t2
            out[r] = (a1 + d1 + 4) >> 3
            out[r + 3] = (a1 - d1 + 4) >> 3
            out[r + 1] = (b1 + cc + 4) >> 3
            out[r + 2] = (b1 - cc + 4) >> 3
        return out

    deq = [0] * 16
    deq[1] = 7 * AC_QLOOKUP[qi]
    res = scalar_idct(deq)
    # B_DC prediction of the first subblock with no neighbors = 128
    exp = np.clip(128 + np.array(res).reshape(4, 4), 0, 255)
    assert (y[0:4, 0:4] == exp).all()


# --- guards ------------------------------------------------------------------


def test_vp8_guards():
    big = encode_vp8_frame(width=16, height=16)
    # oversized dims → PIL handoff before any allocation
    w = 4000
    h = VP8_MAX_PIXELS // w + 16
    hdr = bytearray(big)
    hdr[6] = w & 0xFF
    hdr[7] = (w >> 8) & 0x3F
    hdr[8] = h & 0xFF
    hdr[9] = (h >> 8) & 0x3F
    with pytest.raises(NotImplementedError, match="VP8_MAX_PIXELS"):
        decode_vp8(bytes(hdr))
    # inter frame flag → rejected
    bad = bytearray(big)
    bad[0] |= 1
    with pytest.raises(ValueError, match="keyframes"):
        decode_vp8(bytes(bad))
    with pytest.raises(ValueError):
        decode_vp8(big[:8])


def test_decode_webp_dispatches_lossy():
    from tiledb_vector_search_spark.objects.codecs import decode_image

    img = np.full((24, 40, 3), 90, dtype=np.uint8)
    blob = encode_vp8_lossy_image(img, y_ac_qi=4)
    out = decode_image(blob)
    assert out.shape == (24, 40, 4)
    err = np.abs(out[:, :, :3].astype(int) - img.astype(int))
    assert err.mean() < 2.0, err.mean()


def test_lossy_reencode_pairs_with_png_original_in_phash():
    """The codec-parity gate: a lossy-VP8 re-encode of a PNG original
    must land next to it in pHash space (different bytes, same
    content — what the perceptual dedup family needs from the codec)."""
    from tiledb_vector_search_spark.objects.codecs import (
        decode_image,
        encode_png,
    )
    from tiledb_vector_search_spark.operators.image_dedup import (
        phash64_pixels,
    )

    rng = np.random.default_rng(11)
    img = np.clip(
        np.cumsum(rng.integers(-5, 6, size=(64, 64, 3)), axis=0) + 120,
        0, 255,
    ).astype(np.uint8)
    png = encode_png(img)
    lossy = encode_vp8_lossy_image(img, y_ac_qi=12)
    h_png = phash64_pixels(decode_image(png))
    h_vp8 = phash64_pixels(decode_image(lossy))
    assert bin(h_png ^ h_vp8).count("1") <= 6


# --- libwebp differential (the decode core must be BIT-EXACT) ----------------


@needs_libwebp
@pytest.mark.parametrize("quality", [10, 50, 75, 95])
@pytest.mark.parametrize("kind", ["smooth", "noise", "structured"])
def test_bit_exact_vs_libwebp(quality, kind):
    rng = np.random.default_rng(quality)
    h, w = 48, 61  # non-multiple-of-16 on one axis
    if kind == "smooth":
        img = np.clip(
            np.cumsum(rng.integers(-4, 5, size=(h, w, 3)), axis=1) + 120,
            0, 255,
        ).astype(np.uint8)
    elif kind == "noise":
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    else:
        yy, xx = np.indices((h, w))
        img = np.stack(
            [(yy * 3 + xx * 5) % 256, (yy * 7) % 256, (xx * 11) % 256],
            axis=-1,
        ).astype(np.uint8)
        img[10:20, 10:30] = rng.integers(0, 256, size=(10, 20, 3))
    blob = _lib_encode_rgb(img, quality)
    ref = _lib_decode_yuv(blob)
    got = decode_vp8_yuv(_vp8_payload(blob))
    for name, a, b in zip("YUV", got, ref):
        assert (a == b).all(), (
            f"{name} plane differs: {int((a != b).sum())} px"
        )


@needs_libwebp
def test_libwebp_accepts_and_agrees_on_our_streams():
    """Round the other way: libwebp decodes our minimal encoder's
    streams to the same YUV planes (validates the encoder as a fixture
    generator AND the decoder against an independent implementation)."""
    rng = np.random.default_rng(2)
    yb = {
        (my, mx, sy, sx): rng.integers(-50, 51, 16).tolist()
        for my in range(2) for mx in range(2)
        for sy in range(4) for sx in range(4)
    }
    bm = {
        (my, mx, sy, sx): int(rng.integers(0, 10))
        for my in range(2) for mx in range(2)
        for sy in range(4) for sx in range(4)
    }
    pay = encode_vp8_frame(
        width=32, height=32, ymode=B_PRED, b_modes=bm, y_blocks=yb,
        filter_level=25,
    )
    ref = _lib_decode_yuv(wrap_webp(pay))
    got = decode_vp8_yuv(pay)
    for name, a, b in zip("YUV", got, ref):
        assert (a == b).all(), f"{name} differs"


@needs_libwebp
def test_vp8_tables_freshness():
    """The committed RFC-constant tables must match a fresh extraction
    from the system libwebp (guards against silent drift in the
    generated module)."""
    import re

    from tiledb_vector_search_spark.objects import vp8_tables as T

    path = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
    try:
        data = open(path, "rb").read()
    except OSError:
        pytest.skip("libwebp binary not readable")
    t0b1c0 = bytes([253, 136, 254, 255, 228, 219])
    m = re.search(re.escape(bytes([128] * 33) + t0b1c0), data)
    assert m, "coeff-probs anchor not found"
    probs = list(data[m.start() : m.start() + 1056])
    flat = [
        T.COEFF_PROBS[i][j][k][l]
        for i in range(4) for j in range(8) for k in range(3)
        for l in range(11)
    ]
    assert flat == probs
    m2 = re.search(
        re.escape(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])), data
    )
    assert m2
    lib_bmode = list(data[m2.start() : m2.start() + 900])
    perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]
    for a in range(10):
        for l in range(10):
            assert (
                T.KF_BMODE_PROBS[a][l]
                == lib_bmode[
                    (perm[a] * 10 + perm[l]) * 9 : (perm[a] * 10 + perm[l])
                    * 9
                    + 9
                ]
            )
