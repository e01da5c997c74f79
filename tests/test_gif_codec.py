"""GIF codec tests: hand-derived fixed streams, encode→decode roundtrip
properties, LZW unit coverage (table growth, KwKwK, truncation, corrupt
codes), animation compositing (disposal 0-3, transparency, offsets),
and a BIT-LEVEL differential against the system giflib in BOTH
directions — our encoder → ``DGifSlurp``, and ``EGif*`` → our decoder.

Fixture philosophy (the repo codec rule): every expected pixel comes
from a hand derivation or an independent implementation (giflib), never
from the decoder under test.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.gif import (
    _lzw_decode,
    _lzw_encode,
    _parse_gif,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    sample_gif_frames,
)

rng = np.random.default_rng(20260815)


def _rand_paletted(h, w, ncolors, seed_rng=rng):
    pal = np.unique(
        seed_rng.integers(0, 256, (ncolors, 3), dtype=np.uint8), axis=0
    )
    return pal[seed_rng.integers(0, len(pal), (h, w))]


# --- hand-derived fixed stream ----------------------------------------------

# 2x2 checkerboard, 2-color GCT.  The LZW payload is hand-traced:
# min_code_size=2 -> clear=4, eoi=5, initial width 3.  Indices 0,1,1,0
# encode as: clear(4,w3), 0(w3), 1(w3), 1(w3) [table reaches 9 entries
# -> width 4], 0(w4), eoi(5,w4).  LSB-first packing of the bit sequence
# 001 000 100 100 0000 1010 gives bytes 44 02 05.
_CHECKER_GIF = bytes.fromhex(
    "474946383961"  # "GIF89a"
    "020002008000 00"  # LSD: 2x2, GCT present (2 entries), bg=0, aspect=0
    "000000ffffff"  # GCT: black, white
    "2c000000000200020000"  # image descriptor at (0,0), 2x2, no LCT
    "02"  # LZW minimum code size
    "03440205"  # one 3-byte sub-block: the hand-traced LZW payload
    "00"  # sub-block terminator
    "3b".replace(" ", "")
)


def test_hand_derived_checkerboard():
    k, w_ = [0, 0, 0], [255, 255, 255]
    expected = np.array([[k, w_], [w_, k]], np.uint8)
    assert (decode_gif(_CHECKER_GIF) == expected).all()
    # and our encoder reproduces the exact hand-built bytes
    assert encode_gif([expected]) == _CHECKER_GIF


# --- LZW unit ----------------------------------------------------------------


def test_lzw_roundtrip_table_growth_to_12_bits():
    # 300k low-entropy symbols force the table through every width up to
    # 12 bits and across the conservative early clear
    data = rng.integers(0, 4, 300_000, dtype=np.uint8).tobytes()
    enc = _lzw_encode(data, 2)
    assert bytes(_lzw_decode(enc, 2, len(data))) == data
    # and at the max min-code-size with full-entropy symbols
    data = rng.integers(0, 256, 120_000, dtype=np.uint8).tobytes()
    assert bytes(_lzw_decode(_lzw_encode(data, 8), 8, len(data))) == data


def test_lzw_kwkwk_case():
    # "aaaa..." immediately emits the just-registered code (KwKwK)
    data = b"\x00" * 64
    assert bytes(_lzw_decode(_lzw_encode(data, 2), 2, 64)) == data


def test_lzw_truncated_stream_returns_prefix():
    data = rng.integers(0, 4, 500, dtype=np.uint8).tobytes()
    enc = _lzw_encode(data, 2)
    got = bytes(_lzw_decode(enc[: len(enc) // 2], 2, 500))
    assert 0 < len(got) < 500 and data.startswith(got)


def test_lzw_corrupt_code_raises():
    # width 3 after clear; code 7 is beyond the 6-entry table -> corrupt.
    # bits: clear=100, then 111 -> LSB-first byte 0b00111001 = 0x39
    with pytest.raises(ValueError, match="corrupt"):
        _lzw_decode(b"\x39", 2, 10)


def test_lzw_rejects_bad_min_code_size():
    for mcs in (0, 1, 9, 12):
        with pytest.raises(ValueError, match="minimum code size"):
            _lzw_decode(b"\x00", mcs, 1)


# --- roundtrip properties ----------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_random_images(interlace):
    for trial in range(12):
        ncol = int(rng.integers(2, 257))
        h, w = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        img = _rand_paletted(h, w, ncol)
        blob = encode_gif([img], interlace=interlace)
        assert (decode_gif(blob) == img).all(), (trial, interlace)


def test_roundtrip_interlace_heights_cross_pass_boundaries():
    # heights 1..10 hit every Adam-style GIF pass-start combination
    for h in range(1, 11):
        img = _rand_paletted(h, 5, 17)
        assert (decode_gif(encode_gif([img], interlace=True)) == img).all()


def test_first_frame_fast_path_matches_full_decode():
    frames = [_rand_paletted(9, 11, 30) for _ in range(3)]
    blob = encode_gif(frames)
    assert (decode_gif(blob) == decode_gif_frames(blob)[0]).all()


# --- screen/background/partial-frame semantics -------------------------------


def test_partial_first_frame_shows_background_color():
    red = np.full((2, 2, 3), [200, 10, 10], np.uint8)
    blob = encode_gif(
        [red],
        screen_size=(4, 5),
        offsets=[(1, 2)],
        background=[200, 10, 10],
    )
    out = decode_gif(blob)
    assert out.shape == (4, 5, 3)
    assert (out == [200, 10, 10]).all()  # bg == frame color here
    # distinct background: uncovered pixels take the GCT bg entry
    blue = np.full((2, 2, 3), [0, 0, 250], np.uint8)
    blob = encode_gif(
        [blue, red], screen_size=(4, 5), offsets=[(1, 2), (0, 0)],
        background=[200, 10, 10],
    )
    out = decode_gif_frames(blob)[0]
    assert (out[1:3, 2:4] == [0, 0, 250]).all()
    assert (out[0, 0] == [200, 10, 10]).all()


def test_transparent_pixels_take_background():
    t = [1, 2, 3]
    img = np.array([[t, [9, 9, 9]], [[9, 9, 9], t]], np.uint8)
    blob = encode_gif([img], transparent_color=t, background=[7, 7, 7])
    out = decode_gif(blob)
    assert (out[0, 0] == [7, 7, 7]).all() and (out[1, 1] == [7, 7, 7]).all()
    assert (out[0, 1] == [9, 9, 9]).all()


# --- animation compositing ---------------------------------------------------


def test_disposal_none_keeps_pixels():
    base = np.zeros((4, 4, 3), np.uint8)
    patch = np.full((2, 2, 3), 200, np.uint8)
    blob = encode_gif([base, patch], offsets=[(0, 0), (1, 1)])
    f0, f1 = decode_gif_frames(blob)
    assert (f0 == base).all()
    exp = base.copy()
    exp[1:3, 1:3] = 200
    assert (f1 == exp).all()


def test_disposal_background_clears_region():
    base = np.full((4, 4, 3), 50, np.uint8)
    patch = np.full((2, 2, 3), 200, np.uint8)
    dot = np.full((1, 1, 3), 99, np.uint8)
    blob = encode_gif(
        [base, patch, dot],
        offsets=[(0, 0), (1, 1), (0, 0)],
        disposals=[0, 2, 0],
        background=[50, 50, 50],
    )
    f0, f1, f2 = decode_gif_frames(blob)
    exp1 = base.copy()
    exp1[1:3, 1:3] = 200
    assert (f1 == exp1).all()
    # after disposal 2 the patch region is transparent -> bg color
    exp2 = base.copy()
    exp2[1:3, 1:3] = 50
    exp2[0, 0] = 99
    assert (f2 == exp2).all()


def test_disposal_previous_restores_pixels():
    base = np.full((4, 4, 3), 50, np.uint8)
    patch = np.full((2, 2, 3), 200, np.uint8)
    dot = np.full((1, 1, 3), 99, np.uint8)
    blob = encode_gif(
        [base, patch, dot],
        offsets=[(0, 0), (1, 1), (3, 3)],
        disposals=[0, 3, 0],
    )
    f2 = decode_gif_frames(blob)[2]
    exp = base.copy()  # the patch was restored away
    exp[3, 3] = 99
    assert (f2 == exp).all()


def test_animation_transparency_shows_through():
    base = np.array([[[10, 10, 10], [20, 20, 20]]], np.uint8)
    t = [0, 255, 0]
    overlay = np.array([[t, [30, 30, 30]]], np.uint8)
    blob = encode_gif([base, overlay], transparent_color=t)
    f1 = decode_gif_frames(blob)[1]
    assert (f1[0, 0] == [10, 10, 10]).all()  # transparent: base shows
    assert (f1[0, 1] == [30, 30, 30]).all()


def test_sample_gif_frames_contract():
    frames = [np.full((3, 3, 3), 10 * i, np.uint8) for i in range(6)]
    blob = encode_gif(frames)
    all_f = decode_gif_frames(blob)
    for n in (1, 2, 3):
        got = sample_gif_frames(blob, n)
        assert len(got) == len(all_f[::n])
        for a, b in zip(got, all_f[::n]):
            assert (a == b).all()


# --- guards / strictness -----------------------------------------------------


def test_pixel_budget_guard_trips_before_decode():
    import struct

    # header claims a 65000x65000 screen; guard must fire on the
    # descriptor alone (the blob has no raster at all)
    blob = b"GIF89a" + struct.pack("<HHBBB", 65000, 65000, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="GIF_MAX_PIXELS"):
        decode_gif(blob)


def test_frame_beyond_screen_clips():
    """A frame exceeding the logical screen is mis-authored but real
    decoders (PIL, browsers) tolerate it by clipping — the native path
    must too, not hard-fail the blob (ADVICE r7)."""
    img = _rand_paletted(4, 4, 4)
    blob = bytearray(encode_gif([img]))
    # image descriptor starts after header+GCT; bump its left offset
    pos = blob.index(0x2C, 13)
    blob[pos + 1] = 3  # left=3 on a 4-wide screen with a 4-wide frame
    out = decode_gif(bytes(blob))
    assert out.shape == (4, 4, 3)
    # the on-screen sliver is the frame's first column at x=3 ...
    assert (out[:, 3] == img[:, 0]).all()
    # ... and everything left of it is one flat background color
    assert (out[:, :3] == out[0, 0]).all()
    # the animation compositor clips identically
    frames = decode_gif_frames(bytes(blob))
    assert len(frames) == 1 and (frames[0][:, 3] == img[:, 0]).all()
    assert (frames[0][:, :3] == frames[0][0, 0]).all()


def test_index_beyond_palette_raises():
    # 4-entry GCT but a raster symbol of 5: encode with 8 colors then
    # shrink the GCT flag -- simpler: hand-build via a 2-entry palette
    # image whose LZW stream emits index 3
    img = np.array([[[0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3]]], np.uint8)
    blob = bytearray(encode_gif([img]))  # 4-color GCT
    # shrink the declared GCT to 2 entries: flags bits 0-2 from 1 -> 0,
    # and drop the last 2 palette entries (6 bytes)
    assert blob[10] & 7 == 1
    blob[10] = (blob[10] & ~7) | 0
    del blob[13 + 6 : 13 + 12]
    with pytest.raises(ValueError, match="beyond the color table"):
        decode_gif(bytes(blob))


def test_no_image_raises():
    import struct

    blob = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="no image"):
        decode_gif(blob)


def test_unknown_block_and_bad_magic_raise():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    blob = bytearray(_CHECKER_GIF)
    blob[19] = 0x7F  # image-descriptor introducer -> junk
    with pytest.raises(ValueError, match="unknown GIF block"):
        decode_gif(bytes(blob))


def test_truncated_raster_zero_pads():
    blob = bytearray(_CHECKER_GIF)
    # drop the last LZW payload byte (keep sub-block framing valid)
    del blob[-4]  # 0x05 inside the 3-byte sub-block
    blob[-5] = 2  # sub-block length 3 -> 2
    out = decode_gif(bytes(blob))
    assert out.shape == (2, 2, 3)  # decodes, missing pixels -> index 0


# --- dispatch ---------------------------------------------------------------


def test_decode_image_dispatches_gif():
    from tiledb_vector_search_spark.objects.codecs import decode_image
    from tiledb_vector_search_spark.objects.readers import (
        DirectoryImageReader,
    )

    img = _rand_paletted(8, 8, 12)
    blob = encode_gif([img])
    assert (decode_image(blob) == img).all()
    assert (DirectoryImageReader.decode(blob) == img).all()


# --- giflib differential -----------------------------------------------------


def _libgif():
    for name in ("libgif.so.7", "libgif.so", ctypes.util.find_library("gif")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LIB = _libgif()
needs_libgif = pytest.mark.skipif(
    _LIB is None, reason="system giflib not available"
)

GifWord = ctypes.c_int


class GifColorType(ctypes.Structure):
    _fields_ = [
        ("Red", ctypes.c_ubyte),
        ("Green", ctypes.c_ubyte),
        ("Blue", ctypes.c_ubyte),
    ]


class ColorMapObject(ctypes.Structure):
    _fields_ = [
        ("ColorCount", ctypes.c_int),
        ("BitsPerPixel", ctypes.c_int),
        ("SortFlag", ctypes.c_bool),
        ("Colors", ctypes.POINTER(GifColorType)),
    ]


class GifImageDesc(ctypes.Structure):
    _fields_ = [
        ("Left", GifWord),
        ("Top", GifWord),
        ("Width", GifWord),
        ("Height", GifWord),
        ("Interlace", ctypes.c_bool),
        ("ColorMap", ctypes.POINTER(ColorMapObject)),
    ]


class ExtensionBlock(ctypes.Structure):
    _fields_ = [
        ("ByteCount", ctypes.c_int),
        ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
        ("Function", ctypes.c_int),
    ]


class SavedImage(ctypes.Structure):
    _fields_ = [
        ("ImageDesc", GifImageDesc),
        ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock)),
    ]


class GifFileType(ctypes.Structure):
    _fields_ = [
        ("SWidth", GifWord),
        ("SHeight", GifWord),
        ("SColorResolution", GifWord),
        ("SBackGroundColor", GifWord),
        ("AspectByte", ctypes.c_ubyte),
        ("SColorMap", ctypes.POINTER(ColorMapObject)),
        ("ImageCount", ctypes.c_int),
        ("Image", GifImageDesc),
        ("SavedImages", ctypes.POINTER(SavedImage)),
        ("ExtensionBlockCount", ctypes.c_int),
        ("ExtensionBlocks", ctypes.POINTER(ExtensionBlock)),
        ("Error", ctypes.c_int),
        ("UserData", ctypes.c_void_p),
        ("Private", ctypes.c_void_p),
    ]


_INPUT_FUNC = ctypes.CFUNCTYPE(
    ctypes.c_int,
    ctypes.POINTER(GifFileType),
    ctypes.POINTER(ctypes.c_ubyte),
    ctypes.c_int,
)
_OUTPUT_FUNC = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int
)

if _LIB is not None:
    _LIB.DGifOpen.restype = ctypes.POINTER(GifFileType)
    _LIB.DGifOpen.argtypes = [
        ctypes.c_void_p,
        _INPUT_FUNC,
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.DGifSlurp.argtypes = [ctypes.POINTER(GifFileType)]
    _LIB.DGifCloseFile.argtypes = [
        ctypes.POINTER(GifFileType),
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.EGifOpen.restype = ctypes.c_void_p
    _LIB.EGifOpen.argtypes = [
        ctypes.c_void_p,
        _OUTPUT_FUNC,
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.GifMakeMapObject.restype = ctypes.POINTER(ColorMapObject)
    _LIB.GifMakeMapObject.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(GifColorType),
    ]
    _LIB.EGifPutScreenDesc.argtypes = (
        [ctypes.c_void_p] + [ctypes.c_int] * 4 + [ctypes.POINTER(ColorMapObject)]
    )
    _LIB.EGifPutImageDesc.argtypes = (
        [ctypes.c_void_p]
        + [ctypes.c_int] * 4
        + [ctypes.c_bool, ctypes.POINTER(ColorMapObject)]
    )
    _LIB.EGifPutLine.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    _LIB.EGifCloseFile.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]


def _giflib_slurp(blob: bytes):
    """Decode ``blob`` with the system giflib; per-frame rasters in
    DISPLAY order (giflib's DGifSlurp de-interlaces itself)."""
    state = {"pos": 0}

    def read(_gft, buf, n):
        p = state["pos"]
        chunk = blob[p : p + n]
        state["pos"] = p + len(chunk)
        ctypes.memmove(buf, chunk, len(chunk))
        return len(chunk)

    cb = _INPUT_FUNC(read)
    err = ctypes.c_int(0)
    f = _LIB.DGifOpen(None, cb, ctypes.byref(err))
    assert f, f"DGifOpen error {err.value}"
    assert _LIB.DGifSlurp(f) == 1, f"DGifSlurp error {f.contents.Error}"
    g = f.contents
    out = {"sw": g.SWidth, "sh": g.SHeight, "bg": g.SBackGroundColor}
    if g.SColorMap:
        c = g.SColorMap.contents
        out["gct"] = np.array(
            [
                [c.Colors[i].Red, c.Colors[i].Green, c.Colors[i].Blue]
                for i in range(c.ColorCount)
            ],
            np.uint8,
        )
    frames = []
    for i in range(g.ImageCount):
        d = g.SavedImages[i].ImageDesc
        raster = np.ctypeslib.as_array(
            g.SavedImages[i].RasterBits, shape=(d.Height * d.Width,)
        ).copy()
        frames.append(
            {
                "left": d.Left,
                "top": d.Top,
                "w": d.Width,
                "h": d.Height,
                "interlace": bool(d.Interlace),
                "idx": raster,
            }
        )
    out["frames"] = frames
    e = ctypes.c_int(0)
    _LIB.DGifCloseFile(f, ctypes.byref(e))
    return out


def _giflib_encode(idx: np.ndarray, pal: np.ndarray) -> bytes:
    """Encode an index raster with the system giflib (EGif*) — the
    INDEPENDENT encoder for the decoder-side differential."""
    h, w = idx.shape
    out = bytearray()

    def write(_u, buf, n):
        out.extend(ctypes.string_at(buf, n))
        return n

    cb = _OUTPUT_FUNC(write)
    err = ctypes.c_int(0)
    f = _LIB.EGifOpen(None, cb, ctypes.byref(err))
    assert f, f"EGifOpen error {err.value}"
    n = len(pal)
    colors = (GifColorType * n)(*[GifColorType(*map(int, c)) for c in pal])
    cmap = _LIB.GifMakeMapObject(n, colors)
    assert cmap
    assert _LIB.EGifPutScreenDesc(f, w, h, 8, 0, cmap) == 1
    assert _LIB.EGifPutImageDesc(f, 0, 0, w, h, False, None) == 1
    buf = np.ascontiguousarray(idx, np.uint8)
    for r in range(h):
        row = buf[r]
        assert (
            _LIB.EGifPutLine(
                f, row.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), w
            )
            == 1
        )
    e = ctypes.c_int(0)
    assert _LIB.EGifCloseFile(f, ctypes.byref(e)) == 1
    return bytes(out)


@needs_libgif
def test_differential_our_encoder_giflib_decoder():
    """giflib must read back EXACTLY the pixels our encoder wrote —
    still frames, animations, partial frames, interlace (giflib's
    DGifSlurp de-interlaces, so rasters compare in display order)."""
    for trial in range(8):
        nfr = int(rng.integers(1, 4))
        sh, sw = int(rng.integers(4, 40)), int(rng.integers(4, 40))
        interlace = bool(rng.integers(0, 2))
        frames, offsets = [], []
        for _ in range(nfr):
            fh = int(rng.integers(1, sh + 1))
            fw = int(rng.integers(1, sw + 1))
            offsets.append(
                (int(rng.integers(0, sh - fh + 1)), int(rng.integers(0, sw - fw + 1)))
            )
            frames.append(_rand_paletted(fh, fw, 40))
        blob = encode_gif(frames, screen_size=(sh, sw), offsets=offsets,
                          interlace=interlace)
        ref = _giflib_slurp(blob)
        assert (ref["sw"], ref["sh"]) == (sw, sh)
        assert len(ref["frames"]) == nfr
        for ours, (top, left), theirs in zip(frames, offsets, ref["frames"]):
            assert (theirs["top"], theirs["left"]) == (top, left)
            assert theirs["interlace"] == interlace
            idx = theirs["idx"].reshape(theirs["h"], theirs["w"])
            rgb = ref["gct"][idx]
            assert (rgb == ours).all(), trial


@needs_libgif
def test_differential_giflib_encoder_our_decoder():
    """Our decoder must read back EXACTLY the pixels giflib's own
    (independent) LZW encoder wrote."""
    for npal in (4, 16, 64, 256):
        pal = np.unique(
            rng.integers(0, 256, (npal, 3), dtype=np.uint8), axis=0
        )
        p2 = 1 << max(1, (len(pal) - 1).bit_length())
        pal_p = np.zeros((p2, 3), np.uint8)
        pal_p[: len(pal)] = pal
        h, w = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        idx = rng.integers(0, len(pal), (h, w), dtype=np.uint8)
        blob = _giflib_encode(idx, pal_p)
        out = decode_gif(blob)
        assert (out == pal_p[idx]).all(), npal


@needs_libgif
def test_differential_low_entropy_long_runs():
    """Long constant runs drive giflib's encoder deep into table growth
    and (at 12 bits) deferred clears — the decoder paths a random sweep
    rarely reaches."""
    pal_p = np.zeros((2, 3), np.uint8)
    pal_p[1] = 255
    idx = np.zeros((256, 256), np.uint8)
    idx[::7] = 1  # stripes: long runs of both symbols
    blob = _giflib_encode(idx, pal_p)
    assert (decode_gif(blob) == pal_p[idx]).all()
