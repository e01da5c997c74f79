"""WebP ALPH-plane and animation (ANIM/ANMF) tests.

Covers the last two container flavors: lossy VP8 + separate alpha
plane, and animated WebP.  Expected pixels come from hand derivations,
roundtrips against the module's own fixture encoders (forward filters /
container builder are independent code paths from the decoder), and —
for ALPH — a differential against the SYSTEM libwebp's real encoder
(``WebPEncodeRGBA``), whose alpha channel is lossless and must survive
our decode bit-exactly."""

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.webp import (
    _riff_chunk,
    _riff_container,
    decode_alph,
    decode_webp,
    decode_webp_frames,
    encode_alph,
    encode_webp_anim,
    sample_webp_frames,
)

rng = np.random.default_rng(20260816)


# --- ALPH unit ---------------------------------------------------------------


def test_alph_hand_derived_horizontal_filter():
    # plane [[5,7],[9,4]], horizontal residuals: 5, 7-5=2; row1 first
    # pixel predicts from the pixel ABOVE: 9-5=4, then 4-9=-5≡251
    payload = bytes([0b0100]) + bytes([5, 2, 4, 251])
    got = decode_alph(payload, 2, 2)
    assert got.tolist() == [[5, 7], [9, 4]]


def test_alph_hand_derived_gradient_filter():
    # plane [[1,2],[3,4]]: row0 is horizontal (1, 2-1=1); row1 x0
    # predicts from top (3-1=2); x1 grad=clip(3+2-1)=4 → 0
    payload = bytes([0b1100]) + bytes([1, 1, 2, 0])
    got = decode_alph(payload, 2, 2)
    assert got.tolist() == [[1, 2], [3, 4]]


@pytest.mark.parametrize("filter_method", [0, 1, 2, 3])
@pytest.mark.parametrize("compress", [False, True])
def test_alph_roundtrip_all_filters(filter_method, compress):
    for h, w in ((1, 1), (1, 9), (9, 1), (13, 11), (32, 7)):
        plane = rng.integers(0, 256, (h, w), dtype=np.uint8)
        payload = encode_alph(
            plane, filter_method=filter_method, compress=compress
        )
        assert (decode_alph(payload, w, h) == plane).all(), (h, w)


def test_alph_strictness():
    with pytest.raises(ValueError, match="empty ALPH"):
        decode_alph(b"", 1, 1)
    with pytest.raises(ValueError, match="reserved ALPH"):
        decode_alph(bytes([0x40, 0]), 1, 1)
    with pytest.raises(ValueError, match="compression"):
        decode_alph(bytes([2, 0]), 1, 1)
    with pytest.raises(ValueError, match="truncated raw ALPH"):
        decode_alph(bytes([0, 1, 2]), 2, 2)


# --- still lossy + ALPH ------------------------------------------------------


def _lossy_vp8_chunk_payload(img: np.ndarray) -> bytes:
    from tiledb_vector_search_spark.objects.vp8_encode import (
        encode_vp8_lossy_image,
    )

    blob = encode_vp8_lossy_image(img)
    assert blob[12:16] == b"VP8 "
    (ln,) = struct.unpack("<I", blob[16:20])
    return blob[20 : 20 + ln]


def test_still_lossy_with_alpha_plane():
    base = np.full((16, 16, 3), 128, np.uint8)
    alpha = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    cont = _riff_container(
        _riff_chunk(b"ALPH", encode_alph(alpha, filter_method=2))
        + _riff_chunk(b"VP8 ", _lossy_vp8_chunk_payload(base))
    )
    out = decode_webp(cont)
    assert out.shape == (16, 16, 4)
    assert (out[:, :, 3] == alpha).all()
    # the color part still decodes (lossy — just sanity-bound it)
    assert abs(int(out[:, :, :3].astype(int).mean()) - 128) < 16


# --- animation ---------------------------------------------------------------


def test_anim_compositing_blend_overwrite_dispose():
    base = np.full((8, 8, 4), [10, 20, 30, 255], np.uint8)
    transparent = np.zeros((4, 4, 4), np.uint8)
    solid = np.full((2, 2, 4), [200, 0, 0, 255], np.uint8)
    blob = encode_webp_anim(
        [base, transparent, solid],
        offsets=[(0, 0), (2, 2), (4, 4)],
        disposals=[False, False, True],
        blends=[True, True, False],
    )
    f0, f1, f2 = decode_webp_frames(blob)
    assert (f0 == base).all()
    assert (f1 == base).all()  # fully-transparent blend is a no-op
    exp2 = base.copy()
    exp2[4:6, 4:6] = [200, 0, 0, 255]
    assert (f2 == exp2).all()


def test_anim_no_blend_overwrites_with_transparency():
    base = np.full((4, 4, 4), [50, 50, 50, 255], np.uint8)
    hole = np.zeros((2, 2, 4), np.uint8)
    blob = encode_webp_anim(
        [base, hole], offsets=[(0, 0), (0, 0)], blends=[True, False]
    )
    f1 = decode_webp_frames(blob)[1]
    assert (f1[:2, :2, 3] == 0).all()  # overwrite punched a hole
    assert (f1[2:, 2:] == [50, 50, 50, 255]).all()


def test_anim_dispose_clears_to_transparent():
    a = np.full((4, 4, 4), [1, 2, 3, 255], np.uint8)
    b = np.full((4, 4, 4), [9, 9, 9, 255], np.uint8)
    blob = encode_webp_anim(
        [a, b, np.zeros((2, 2, 4), np.uint8)],
        offsets=[(0, 0), (0, 0), (0, 0)],
        disposals=[False, True, False],
        blends=[True, False, True],
    )
    f2 = decode_webp_frames(blob)[2]
    assert (f2[:, :, 3] == 0).all()  # dispose wiped b; frame 2 is a no-op


def test_anim_blend_integer_math_matches_libwebp_formula():
    # libwebp BlendPixelNonPremult: scale = dst_a*(255-src_a)//255,
    # out_a = src_a + scale, out_c = (src_c*src_a + dst_c*scale)//out_a
    dst = np.full((1, 1, 4), [0, 0, 200, 255], np.uint8)
    src = np.full((1, 1, 4), [100, 100, 100, 128], np.uint8)
    blob = encode_webp_anim([dst, src])
    f1 = decode_webp_frames(blob)[1]
    scale = 255 * (255 - 128) // 255
    exp = [
        (100 * 128 + 0 * scale) // 255,
        (100 * 128 + 0 * scale) // 255,
        (100 * 128 + 200 * scale) // 255,
        255,
    ]
    assert f1[0, 0].tolist() == exp


def test_decode_webp_returns_first_composited_frame():
    frames = [
        rng.integers(0, 256, (6, 6, 4), dtype=np.uint8) for _ in range(3)
    ]
    blob = encode_webp_anim(frames, blends=[False] * 3)
    assert (decode_webp(blob) == decode_webp_frames(blob)[0]).all()


def test_sample_webp_frames_contract():
    frames = [
        np.full((3, 3, 4), [i * 40, 0, 0, 255], np.uint8) for i in range(5)
    ]
    blob = encode_webp_anim(frames, blends=[False] * 5)
    all_f = decode_webp_frames(blob)
    for n in (1, 2, 3):
        got = sample_webp_frames(blob, n)
        assert len(got) == len(all_f[::n])
        assert all((a == b).all() for a, b in zip(got, all_f[::n]))
    # a still image yields exactly one frame through the same surface
    from tiledb_vector_search_spark.objects.webp import encode_vp8l

    still = encode_vp8l(frames[0])
    assert len(sample_webp_frames(still, 2)) == 1


def test_anim_guards():
    f = np.zeros((4, 4, 4), np.uint8)
    blob = bytearray(encode_webp_anim([f, f], blends=[False, False]))
    # corrupt the second ANMF's width field beyond the canvas
    pos = blob.index(b"ANMF", blob.index(b"ANMF") + 4)
    blob[pos + 8 + 6] = 200  # width-1 low byte
    with pytest.raises(ValueError, match="exceeds the VP8X canvas"):
        decode_webp_frames(bytes(blob))
    # no VP8X canvas at all
    anmf = _riff_chunk(b"ANMF", b"\x00" * 16)
    with pytest.raises(ValueError, match="without a VP8X canvas"):
        decode_webp_frames(_riff_container(anmf))
    with pytest.raises(ValueError, match="ANMF offsets must be even"):
        encode_webp_anim([f, f], offsets=[(0, 0), (1, 0)])


def test_anim_pixel_budget_guard():
    # VP8X canvas within bounds, but Σ frame pixels beyond the budget:
    # claim a huge frame in the ANMF header (no payload needed — the
    # guard must fire before any decode)
    vp8x = bytes([0x02, 0, 0, 0]) + (4095).to_bytes(3, "little") + (
        4095
    ).to_bytes(3, "little")
    head = (
        (0).to_bytes(3, "little") * 2
        + (4095).to_bytes(3, "little")
        + (4095).to_bytes(3, "little")
        + (0).to_bytes(3, "little")
        + b"\x00"
    )
    chunks = _riff_chunk(b"VP8X", vp8x)
    for _ in range(2):
        chunks += _riff_chunk(b"ANMF", head)
    with pytest.raises(NotImplementedError, match="WEBP_ANIM_MAX_PIXELS"):
        decode_webp_frames(_riff_container(chunks))


def test_decode_image_dispatches_animated_webp():
    from tiledb_vector_search_spark.objects.codecs import decode_image

    frames = [np.full((5, 5, 3), 77, np.uint8)] * 2
    blob = encode_webp_anim(frames, blends=[False, False])
    out = decode_image(blob)
    assert out.shape == (5, 5, 4)
    assert (out[:, :, :3] == 77).all()


# --- libwebp differential ----------------------------------------------------


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


@needs_libwebp
def test_differential_libwebp_rgba_encoder_alpha_bit_exact():
    """The REAL libwebp encoder (its own ALPH filter + VP8L-compression
    choices) → our decoder: the alpha channel is losslessly coded, so
    it must survive bit-exactly; the lossy color part stays bounded."""
    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    _LIB.WebPFree.argtypes = [ctypes.c_void_p]
    for trial, (h, w) in enumerate(((32, 32), (48, 17), (16, 64))):
        img = np.clip(
            np.cumsum(rng.integers(-4, 5, (h, w, 4)), axis=1) + 120, 0, 255
        ).astype(np.uint8)
        out = ctypes.c_void_p()
        n = _LIB.WebPEncodeRGBA(
            img.tobytes(), w, h, w * 4, 90.0, ctypes.byref(out)
        )
        assert n > 0
        blob = ctypes.string_at(out.value, n)
        _LIB.WebPFree(out)
        dec = decode_webp(blob)
        assert dec.shape == (h, w, 4), trial
        assert (dec[:, :, 3] == img[:, :, 3]).all(), trial
        assert (
            np.abs(
                dec[:, :, :3].astype(int) - img[:, :, :3].astype(int)
            ).max()
            <= 90
        ), trial
