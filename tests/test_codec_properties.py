"""Property-based codec checks (hypothesis): arbitrary shapes/content
round-trip through the dependency-free codecs within their contracts."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tiledb_vector_search_spark.objects.codecs import (
    decode_png,
    decode_pnm,
    decode_wav,
    encode_png,
    encode_pnm,
    encode_wav,
)
from tiledb_vector_search_spark.objects.jpeg import decode_jpeg, encode_jpeg


@st.composite
def _img(draw, channels):
    h = draw(st.integers(1, 20))
    w = draw(st.integers(1, 20))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, 256, size=shape).astype(np.uint8)


@settings(max_examples=30, deadline=None)
@given(_img(1))
def test_png_gray_round_trip(x):
    got = decode_png(encode_png(x))
    assert got.shape == x.shape and (got == x).all()


@settings(max_examples=30, deadline=None)
@given(_img(3))
def test_png_rgb_round_trip(x):
    got = decode_png(encode_png(x))
    assert got.shape == x.shape and (got == x).all()


@settings(max_examples=20, deadline=None)
@given(_img(4))
def test_png_rgba_round_trip(x):
    got = decode_png(encode_png(x))
    assert got.shape == x.shape and (got == x).all()


@settings(max_examples=30, deadline=None)
@given(_img(3))
def test_pnm_round_trip(x):
    got, _ = decode_pnm(encode_pnm(x))
    assert (got == x).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 500),
    st.integers(1, 2),
    st.integers(0, 2**31 - 1),
)
def test_wav_round_trip_within_quantization(n, channels, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, size=(n, channels))
    got, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and got.shape == x.shape
    # got = rint(x·32767)/32768: rounding contributes 0.5/32768 and the
    # conventional asymmetric PCM scale (encode ·32767, decode /32768)
    # contributes |x|/32768 — total ≤ 1.5/32768
    assert np.abs(got - x).max() <= 1.5 / 32768.0 + 1e-12


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 255))
def test_jpeg_flat_images_exact_any_shape(h, w, v):
    g = np.full((h, w), v, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(g, quality=90))
    assert got.shape == (h, w) and (got == v).all()


@settings(max_examples=15, deadline=None)
@given(_img(1))
def test_jpeg_gray_high_quality_error_bound(x):
    got = decode_jpeg(encode_jpeg(x, quality=95))
    assert got.shape == x.shape
    # random noise is JPEG's worst case; q=95 keeps it within a tight
    # absolute bound (quantization steps are small at this quality)
    assert np.abs(got.astype(int) - x.astype(int)).max() <= 20


@settings(max_examples=30, deadline=None)
@given(_img(3))
def test_vp8l_rgb_round_trip(x):
    from tiledb_vector_search_spark.objects.webp import (
        decode_webp,
        encode_vp8l,
    )

    out = decode_webp(encode_vp8l(x))
    assert (out[:, :, :3] == x).all() and (out[:, :, 3] == 255).all()


@settings(max_examples=30, deadline=None)
@given(_img(4))
def test_vp8l_rgba_round_trip(x):
    from tiledb_vector_search_spark.objects.webp import (
        decode_webp,
        encode_vp8l,
    )

    assert (decode_webp(encode_vp8l(x)) == x).all()


def test_decoders_survive_bit_flips_and_truncation():
    """Crawl-robustness: random single-byte corruptions and truncations
    of valid blobs must either decode or raise a normal exception
    quickly — never hang, recurse, or allocate past the bomb guards.
    (Task safety is already guaranteed by the per-blob ``except
    Exception`` isolation in phash64/LumaGrid; this pins the decoders'
    failure MODE.)  Covers the round-7 codecs: arithmetic + 12-bit
    JPEG, GIF, plus baseline JPEG and VP8L WebP as controls."""
    import pathlib
    import time

    from tiledb_vector_search_spark.objects.codecs import (
        decode_image,
        encode_png,
    )
    from tiledb_vector_search_spark.objects.gif import encode_gif
    from tiledb_vector_search_spark.objects.jpeg import encode_jpeg
    from tiledb_vector_search_spark.objects.webp import encode_vp8l

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=2)
    golden = pathlib.Path(__file__).parent / "golden" / "jpeg_arith"
    blobs = {
        "jpeg": encode_jpeg(img, quality=85),
        "jpeg12": encode_jpeg(
            (img.astype(np.uint16) << 4), quality=90, precision=12
        ),
        "arith": (golden / "gray_seq.jpg").read_bytes(),
        "arith_prog": (golden / "color_progressive.jpg").read_bytes(),
        "gif": encode_gif([rgb, np.roll(rgb, 2, axis=1)]),
        "png": encode_png(img),
        "webp": encode_vp8l(rgb),
    }
    t0 = time.monotonic()
    for name, blob in blobs.items():
        n = len(blob)
        for trial in range(120):
            buf = bytearray(blob)
            mode = trial % 3
            if mode == 0:  # single-byte corruption
                buf[int(rng.integers(2, n))] = int(rng.integers(0, 256))
            elif mode == 1:  # truncation
                buf = buf[: int(rng.integers(4, n))]
            else:  # corrupt 3 bytes in the tail half (entropy data)
                for _ in range(3):
                    buf[int(rng.integers(n // 2, n))] = int(
                        rng.integers(0, 256)
                    )
            try:
                out = decode_image(bytes(buf))
                assert out.ndim in (2, 3), (name, trial)
            except Exception as e:  # noqa: BLE001 — failure mode pin
                assert not isinstance(
                    e, (RecursionError, MemoryError, SystemExit)
                ), (name, trial, type(e))
    # the whole 840-case sweep must stay quick — a hang shows up here
    assert time.monotonic() - t0 < 120
