"""Arithmetic-coded JPEG decoding (SOF9/SOF10, T.81 Annexes D/F/G).

Pinning strategy (reference decodes these via PIL:
``apis/python/src/tiledb/vector_search/object_readers/directory_reader.py``):

1. Hermetic: frozen arithmetic fixtures under tests/golden/jpeg_arith/
   (encoded by the SYSTEM libjpeg at freeze time) must decode to the
   frozen pixels — which are the Huffman twin's decode, itself pinned
   independently against hand-derived streams in test_jpeg_codec.py.
   The entropy layer is lossless, so twin equality is exact, not
   approximate.
2. Live differential (when libjpeg.so.62 is importable): fresh random
   images, encoded huff+arith by libjpeg across the process matrix
   (gray/color, sequential/progressive, restart intervals, non-default
   DAC conditioning), must decode byte-identically through this
   package.
"""

import ctypes
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.jpeg import decode_jpeg
from tiledb_vector_search_spark.objects.jpeg_arith import (
    ArithConditioning,
    ArithDecoder,
    _decode_dc_diff,
    _ScanState,
)

ROOT = pathlib.Path(__file__).resolve().parents[1]
GOLDEN = ROOT / "tests" / "golden" / "jpeg_arith"
ENCODER = ROOT / "tools" / "encode_arith_jpeg.py"


def _has_libjpeg() -> bool:
    try:
        ctypes.CDLL("libjpeg.so.62")
        return True
    except OSError:
        return False


needs_libjpeg = pytest.mark.skipif(
    not _has_libjpeg(), reason="system libjpeg.so.62 not available"
)


def _encode(raw: bytes, w, h, ch, q, mode, extra=()) -> bytes:
    p = subprocess.run(
        [sys.executable, str(ENCODER), str(w), str(h), str(ch), str(q),
         mode, *extra],
        input=raw, capture_output=True,
    )
    assert p.returncode == 0, p.stderr.decode()[-500:]
    return p.stdout


def _image(w, h, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, ch) if ch > 1 else (h, w)
    base = np.linspace(0, 255, int(np.prod(shape))).reshape(shape)
    return np.clip(
        base + rng.integers(-70, 70, size=shape), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------- hermetic


@pytest.mark.parametrize(
    "name", ["gray_seq", "color_seq_restart", "color_progressive",
             "gray_cond"]
)
def test_golden_arith_fixture_decodes_exactly(name):
    blob = (GOLDEN / f"{name}.jpg").read_bytes()
    expected = np.load(GOLDEN / f"{name}.npy")
    got = decode_jpeg(blob)
    assert got.dtype == np.uint8
    assert np.array_equal(got, expected)


def test_golden_fixtures_are_actually_arithmetic():
    for f in GOLDEN.glob("*.jpg"):
        blob = f.read_bytes()
        markers = {
            blob[i + 1] for i in range(len(blob) - 1) if blob[i] == 0xFF
        }
        assert markers & {0xC9, 0xCA}, f.name
        assert 0xCC in markers, f"{f.name}: no DAC conditioning marker"


def test_initdec_register_convention():
    """INITDEC loads a FULL 16-bit code window under a 17-bit interval
    register (A=0x10000) — the bug class this pins: an MQ-coder-style
    0x8000/15-bit init decodes every libjpeg stream to zeros."""
    dec = ArithDecoder(bytes([0xAB, 0xCD, 0x12]), 0)
    assert dec.a == 0x10000
    assert (dec.c >> 16) & 0xFFFF == 0xABCD
    assert dec.ct == 0
    assert dec.pos == 2


def test_initdec_unstuffs_ff00():
    dec = ArithDecoder(bytes([0xFF, 0x00, 0x76]), 0)
    assert (dec.c >> 16) & 0xFFFF == 0xFF76
    assert dec.marker_at is None


def test_marker_feeds_zero_bytes():
    dec = ArithDecoder(bytes([0x12, 0x34, 0xFF, 0xD9]), 0)
    assert (dec.c >> 16) & 0xFFFF == 0x1234
    stats = np.zeros(4, np.uint8)
    for _ in range(64):  # drain well past the marker: must not raise
        dec.decode(stats, 0)
    assert dec.marker_at == 2


def test_dac_validation_errors():
    with pytest.raises(ValueError, match="L > U"):
        ArithConditioning().parse_dac(bytes([0x00, 0x23]))  # L=3, U=2
    with pytest.raises(ValueError, match="Kx"):
        ArithConditioning().parse_dac(bytes([0x10, 0x00]))  # Kx=0
    with pytest.raises(ValueError, match="table class"):
        ArithConditioning().parse_dac(bytes([0x20, 0x05]))
    cond = ArithConditioning()
    cond.parse_dac(bytes([0x00, 0x21, 0x10, 0x14]))  # L=1,U=2 / Kx=20
    assert cond.dc_l[0] == 1 and cond.dc_u[0] == 2 and cond.ac_k[0] == 20


def test_dc_magnitude_overflow_raises():
    class AlwaysOne:
        def decode(self, stats, idx):
            return 1

        def decode_fixed(self):
            return 1

    state = _ScanState(1)
    cond = ArithConditioning()
    with pytest.raises(ValueError, match="magnitude overflow"):
        _decode_dc_diff(AlwaysOne(), state.dc(0), state, 0, cond, 0)


def test_truncated_arith_scan_completes_with_zero_feed():
    blob = bytearray((GOLDEN / "gray_seq.jpg").read_bytes())
    sos = bytes(blob).find(b"\xff\xda")
    cut = bytes(blob[: sos + 20])  # a few entropy bytes, then nothing
    out = decode_jpeg(cut)  # zero bytes feed after truncation (F.2.2.2)
    assert out.shape == (16, 16)


def test_decode_image_dispatches_arith_jpeg():
    from tiledb_vector_search_spark.objects.codecs import decode_image

    blob = (GOLDEN / "gray_seq.jpg").read_bytes()
    expected = np.load(GOLDEN / "gray_seq.npy")
    assert np.array_equal(decode_image(blob), expected)


# ------------------------------------------------- libjpeg differential


@needs_libjpeg
@pytest.mark.parametrize(
    "w,h,ch,q,extra",
    [
        (16, 16, 1, 90, ()),
        (8, 8, 1, 50, ()),
        (33, 9, 1, 85, ()),
        (24, 17, 3, 90, ()),          # 4:2:0 color, non-multiple dims
        (40, 40, 3, 50, ("2",)),      # restart interval 2
        (16, 16, 1, 90, ("3",)),      # gray restarts
    ],
)
def test_sequential_twin_differential(w, h, ch, q, extra):
    raw = _image(w, h, ch, seed=w * h + ch).tobytes()
    huff = _encode(raw, w, h, ch, q, "huff", extra)
    arith = _encode(raw, w, h, ch, q, "arith", extra)
    assert np.array_equal(decode_jpeg(huff), decode_jpeg(arith))


@needs_libjpeg
@pytest.mark.parametrize(
    "w,h,ch,q,extra",
    [
        (16, 16, 1, 90, ("progressive",)),
        (24, 17, 3, 85, ("progressive",)),   # DC-interleaved + AC scans
        (40, 40, 3, 50, ("2", "progressive")),  # restarts in every scan
    ],
)
def test_progressive_twin_differential(w, h, ch, q, extra):
    raw = _image(w, h, ch, seed=w + h + ch).tobytes()
    huff = _encode(raw, w, h, ch, q, "huff", extra)
    arith = _encode(raw, w, h, ch, q, "arith", extra)
    assert np.array_equal(decode_jpeg(huff), decode_jpeg(arith))


@needs_libjpeg
@pytest.mark.parametrize("cond", ["cond=2,4,1", "cond=1,2,20", "cond=0,0,63"])
def test_nondefault_dac_conditioning(cond):
    """Exercises the DC conditioning-category thresholds (L/U) and the
    AC Kx low/high statistics split away from the 0/1/5 defaults."""
    w, h = 32, 24
    raw = _image(w, h, 1, seed=len(cond)).tobytes()
    huff = _encode(raw, w, h, 1, 85, "huff")
    arith = _encode(raw, w, h, 1, 85, "arith", (cond,))
    assert np.array_equal(decode_jpeg(huff), decode_jpeg(arith))


@needs_libjpeg
def test_golden_fixtures_are_fresh():
    """Regenerating the fixtures with the generator script must produce
    the committed bytes (same pinned libjpeg in this environment)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "jpeg_arith_golden_generate", GOLDEN / "generate.py"
    )
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)

    for name, (w, h, ch, q, extra) in g.FIXTURES.items():
        raw = g.source_pixels(w, h, ch)
        arith = g.encode(raw, w, h, ch, q, "arith", extra)
        assert arith == (GOLDEN / f"{name}.jpg").read_bytes(), name


# --- round-9 self-review regressions ------------------------------------------


def _gray_seq() -> bytes:
    return (GOLDEN / "gray_seq.jpg").read_bytes()


def test_arith_single_component_2x2_sampling_decodes():
    """Mirror of the Huffman regression: a grayscale SOF9 frame
    declaring 2x2 sampling factors is legal (Ns=1 scans are
    NON-interleaved, so the entropy stream is identical to 1x1); the
    old MCU-interleaved geometry silently desynced the arithmetic
    decoder on a padded grid."""
    blob = _gray_seq()
    want = decode_jpeg(blob)
    i = blob.index(b"\xff\xc9")
    assert blob[i + 9] == 1  # nc == 1
    patched = bytearray(blob)
    patched[i + 11] = 0x22
    got = decode_jpeg(bytes(patched))
    np.testing.assert_array_equal(got, want)


def test_arith_unknown_scan_component_raises_valueerror():
    """Corrupt-blob taxonomy: a scan referencing a component id the
    frame doesn't declare must raise ValueError (callers isolate bad
    blobs with 'except ValueError'), not a raw KeyError."""
    blob = bytearray(_gray_seq())
    i = blob.index(b"\xff\xda")
    blob[i + 5] = 0x77  # unknown component id
    with pytest.raises(ValueError, match="unknown component"):
        decode_jpeg(bytes(blob))
