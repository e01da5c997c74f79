"""Baseline JPEG codec: round-trip bounds, hand-built 4:2:0 + restart
streams with hand-derived pixel answers, IDCT identity, error policy."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.jpeg import (
    _AC_CHROMA,
    _AC_LUMA,
    _DC_CHROMA,
    _DC_LUMA,
    _BitWriter,
    _build_encode_table,
    _dct8,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)


def test_idct_is_inverse_of_orthonormal_dct():
    d = _dct8()
    assert np.allclose(d @ d.T, np.eye(8), atol=1e-12)


def test_flat_gray_is_exact():
    g = np.full((16, 24), 130, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(g, quality=90)) == g).all()


def test_smooth_gradient_round_trip_bound():
    gy, gx = np.mgrid[0:32, 0:48]
    img = ((gx * 3 + gy * 2) % 256).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quality=90))
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 4 and err.mean() <= 1.5


def test_rgb_round_trip_bound_and_odd_dims():
    rng = np.random.default_rng(0)
    rgb = np.clip(
        np.cumsum(rng.integers(-3, 4, size=(21, 37, 3)), axis=1) + 120,
        0, 255,
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(rgb, quality=92))
    assert got.shape == rgb.shape
    err = np.abs(got.astype(int) - rgb.astype(int))
    assert err.max() <= 24 and err.mean() <= 4.0


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _headers(h, w, comps, qvals, restart=None):
    """Minimal JFIF headers: comps = [(cid, hv, tq)], qvals = {tq: int}
    (FLAT quant tables — every entry the same value, so hand arithmetic
    stays trivial)."""
    out = bytearray(b"\xff\xd8")
    for tq, v in qvals.items():
        out += _seg(0xDB, bytes([tq]) + bytes([v] * 64))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += _seg(0xC0, sof)
    for tc, tabs in ((0, (_DC_LUMA, _DC_CHROMA)), (1, (_AC_LUMA, _AC_CHROMA))):
        for th in range(2):
            bits, huffval = tabs[th]
            out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval))
    if restart is not None:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, _hv, _tq in comps:
        th = 0 if cid == 1 else 1
        sos += bytes([cid, (th << 4) | th])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    return out


def _write_dc_block(wtr, tid, diff, dc_enc, ac_enc):
    t, mag = _magnitude(diff)
    code, ln = dc_enc[tid][t]
    wtr.write(code, ln)
    if t:
        wtr.write(mag, t)
    code, ln = ac_enc[tid][0x00]  # EOB: all AC zero
    wtr.write(code, ln)


def test_hand_built_420_stream_decodes_to_expected_color():
    """One 16×16 MCU, 4:2:0, flat YCbCr = (152, 148, 108), quant = 2
    everywhere.  DC of a flat block with level-shifted value c is 8c
    (orthonormal DCT), so quantized DC = round(8c/2) = 4c — hand
    arithmetic the decoder must invert through dequant + IDCT +
    upsample + color conversion.  The expected RGB comes from the
    BT.601 formulas directly, not from the encoder."""
    yv, cbv, crv = 152, 148, 108
    dc_enc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_enc = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]
    wtr = _BitWriter()
    # 4 Y blocks: first carries the full DC diff, rest zero diffs
    _write_dc_block(wtr, 0, 4 * (yv - 128), dc_enc, ac_enc)
    for _ in range(3):
        _write_dc_block(wtr, 0, 0, dc_enc, ac_enc)
    _write_dc_block(wtr, 1, 4 * (cbv - 128), dc_enc, ac_enc)
    _write_dc_block(wtr, 1, 4 * (crv - 128), dc_enc, ac_enc)
    wtr.flush()
    blob = bytes(
        _headers(16, 16, [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)], {0: 2, 1: 2})
        + wtr.out
        + b"\xff\xd9"
    )
    got = decode_jpeg(blob)
    assert got.shape == (16, 16, 3)
    cb, cr = cbv - 128.0, crv - 128.0
    want = np.clip(
        np.rint(
            [yv + 1.402 * cr, yv - 0.344136 * cb - 0.714136 * cr, yv + 1.772 * cb]
        ),
        0, 255,
    ).astype(np.uint8)
    assert (got == want[None, None, :]).all(), (got[0, 0], want)


def test_hand_built_restart_markers_reset_dc_prediction():
    """4 MCUs of gray (8×32), DRI=1: every MCU is followed by RSTn and
    each carries the FULL dc (prediction resets).  Decoded row must be
    the four flat stripes."""
    vals = [100, 140, 90, 200]
    dc_enc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_enc = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]
    body = bytearray()
    for i, v in enumerate(vals):
        wtr = _BitWriter()
        _write_dc_block(wtr, 0, 4 * (v - 128), dc_enc, ac_enc)
        wtr.flush()
        body += wtr.out
        if i < len(vals) - 1:
            body += bytes([0xFF, 0xD0 + (i % 8)])
    blob = bytes(
        _headers(8, 32, [(1, 0x11, 0)], {0: 2}, restart=1)
        + body
        + b"\xff\xd9"
    )
    got = decode_jpeg(blob)
    assert got.shape == (8, 32)
    for i, v in enumerate(vals):
        stripe = got[:, i * 8 : (i + 1) * 8]
        assert (stripe == v).all(), (i, stripe[0, 0], v)


def test_unsupported_and_garbage_raise_clearly():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")
    g = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(g))
    # relabel SOF0 as SOF2: the sequential scan header (Ss=0, Se=63) is
    # malformed under a progressive frame — rejected, not mis-decoded
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive scan header"):
        decode_jpeg(bytes(blob))
    # unsupported sample precision raises clearly (8- and 12-bit decode
    # natively; arithmetic SOFs are covered in test_jpeg_arith.py)
    blob = bytearray(encode_jpeg(g))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 4] = 16  # SOF precision byte
    with pytest.raises(NotImplementedError, match="precision 16"):
        decode_jpeg(bytes(blob))
    # lossless-process SOF (0xC3) still raises clearly
    blob = bytearray(encode_jpeg(g))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(blob))


def test_decode_image_dispatches_jpeg(spark):
    from tiledb_vector_search_spark.objects.codecs import decode_image
    from tiledb_vector_search_spark.objects.readers import DirectoryImageReader

    g = np.full((8, 8), 99, dtype=np.uint8)
    blob = encode_jpeg(g, quality=90)
    assert (decode_image(blob) == g).all()
    assert (DirectoryImageReader.decode(blob) == g).all()


def test_phash_over_jpeg_blobs(spark):
    from tiledb_vector_search_spark.operators.image_dedup import (
        image_near_duplicates,
    )

    rng = np.random.default_rng(4)
    rows = []
    for i in range(8):
        gy, gx = np.mgrid[0:16, 0:16]
        img = (
            (rng.integers(0, 256, (16, 16)) * 0.3 + (gx * 5 + gy * 2) * (i % 3 + 1))
            % 256
        ).astype(np.uint8)
        rows.append((i, bytearray(encode_jpeg(img, quality=90))))
        if i % 4 == 0:
            # a re-encode at lower quality IS the perceptual near-dup case
            rows.append((100 + i, bytearray(encode_jpeg(img, quality=60))))
    df = spark.createDataFrame(rows, "external_id long, image binary")
    pairs = {
        (r.id_a, r.id_b)
        for r in image_near_duplicates(df, max_hamming=8).collect()
    }
    assert {(0, 100), (4, 104)} <= pairs


def test_mjpeg_stream_split_decode_and_sample():
    """Concatenated JPEGs split on STRUCTURE (an APP1 payload containing
    literal FF D9 bytes must not end the frame), decode per frame, and
    frame-sample by skipping unsampled frames at the byte level."""
    from tiledb_vector_search_spark.objects.codecs import (
        decode_mjpeg_stream,
        sample_mjpeg_frames,
        split_mjpeg_stream,
    )

    frames_px = [
        np.full((8, 8), v, dtype=np.uint8) for v in (50, 100, 150, 200)
    ]
    blobs = [encode_jpeg(p, quality=90) for p in frames_px]
    # plant a hostile APP1 (fake EXIF with an embedded EOI) in frame 1
    evil = struct.pack(">BBH", 0xFF, 0xE1, 12) + b"Exif\x00\x00\xff\xd9\x00\x00"
    b1 = blobs[1]
    blobs[1] = b1[:2] + evil + b1[2:]
    stream = b"".join(blobs)
    parts = split_mjpeg_stream(stream)
    assert [len(p) for p in parts] == [len(b) for b in blobs]
    decoded = decode_mjpeg_stream(stream)
    assert [d[0, 0] for d in decoded] == [50, 100, 150, 200]
    sampled = sample_mjpeg_frames(stream, every_n=2)
    assert [s[0, 0] for s in sampled] == [50, 150]
    with pytest.raises(ValueError, match="missing SOI"):
        split_mjpeg_stream(b"junk" + stream)


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


@pytest.mark.parametrize("shape,q", [
    ((8, 8), 85), ((24, 17, 3), 85), ((40, 40, 3), 50), ((16, 9), 95),
])
def test_progressive_decodes_identical_to_baseline(shape, q):
    """The progressive encoder emits the SAME quantized coefficients as
    the baseline encoder, so the two decodes must be bit-identical —
    any divergence is a progressive scan-path bug."""
    from tiledb_vector_search_spark.objects.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(sum(shape) + q)
    img = np.clip(
        np.cumsum(rng.integers(-6, 7, size=shape), axis=0) + 120, 0, 255
    ).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=q))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
    assert (base == prog).all()


def test_progressive_successive_approximation_hand_built():
    """Hand-built 8×8 grayscale stream exercising the refinement paths
    the encoder never emits: DC first at Al=1 + DC refinement bit, AC
    first at Al=1, AC refinement via an EOB run carrying correction
    bits.  True zigzag coefficients: DC=−5, k3=+3, k20=−2 (quant all
    ones); every entropy byte below is derived by hand from T.81 §G.2.
    """
    from tiledb_vector_search_spark.objects.jpeg import _ZIGZAG, _idct2

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # identity quant
    out += _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table 0: symbols {0, 2} at 1 bit → codes 0→'0', 2→'1'
    dc_bits = [2] + [0] * 15
    out += _seg(0xC4, bytes([0x00] + dc_bits + [0, 2]))
    # AC table 0: symbols {0x00, 0x01, 0x21, 0xF0} at 2 bits →
    # codes 00, 01, 10, 11
    ac_bits = [0, 4] + [0] * 14
    out += _seg(0xC4, bytes([0x10] + ac_bits + [0x00, 0x01, 0x21, 0xF0]))

    # scan 1 — DC first, Al=1: sends −5>>1 = −3 (arith): huff t=2 ('1'),
    # magnitude bits '00' → '100' + 1-padding = 0x9F
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bytes([0x9F])
    # scan 2 — DC refine Ah=1: one bit (low bit of −5 = 1) → 0xFF,
    # stuffed
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bytes([0xFF, 0x00])
    # scan 3 — AC first 1..63, Al=1: k3=+3→+1 (run 2: 0x21 '10', mag
    # '1'), ZRL ('11') over k4..19, k20=−2→−1 (0x01 '01', mag '0'),
    # EOB0 ('00') → '1011101000' + padding = 0xBA 0x3F
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + bytes([0xBA, 0x3F])
    # scan 4 — AC refine Ah=1: EOB0 ('00') then correction bits: k3
    # low bit of +3 → 1, k20 low bit of −2 → 0 → '0010' + padding = 0x2F
    out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + bytes([0x2F])
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    coef = np.zeros(64)
    coef[0], coef[3], coef[20] = -5, 3, -2
    block = np.zeros(64)
    block[_ZIGZAG] = coef
    want = np.clip(
        np.rint(_idct2(block.reshape(8, 8)) + 128.0), 0, 255
    ).astype(np.uint8)
    assert (got == want).all(), (got.astype(int) - want.astype(int))


def test_progressive_eob_runs_across_blocks():
    """A flat 32×32 image quantizes to all-zero AC bands: the second AC
    scan is one EOBn covering every block — EOBRUN decode across block
    and restart-free boundaries."""
    from tiledb_vector_search_spark.objects.jpeg import (
        encode_jpeg_progressive,
    )

    img = np.full((32, 32), 137, dtype=np.uint8)
    blob = encode_jpeg_progressive(img, quality=85)
    got = decode_jpeg(blob)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    assert (got == base).all()
    assert np.abs(got.astype(int) - 137).max() <= 1


def test_progressive_420_subsampled_hand_built():
    """Progressive + 4:2:0: interleaved DC scan in MCU order (2×2 luma
    blocks + 1 of each chroma per MCU) followed by per-component AC
    scans (all-EOB), hand-built.  DC-only blocks are flat (orthonormal
    IDCT of a lone DC v gives v/8 uniform), so every expected pixel is
    derivable by hand: 128 + cumulative_dc/8 per block, chroma
    upsampled 2×."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([8] * 64))  # quant: all 8s
    # SOF2: 16×16, Y with 2x2 sampling, Cb/Cr 1x1
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += _seg(0xC2, sof)
    # DC table 0: symbols {0, 2} at 1 bit → codes '0'(0), '1'(2)
    out += _seg(0xC4, bytes([0x00, 2] + [0] * 15 + [0, 2]))
    # AC table 0: single... needs completeness — {0x00, 0xF0} at 1 bit
    out += _seg(0xC4, bytes([0x10, 2] + [0] * 15 + [0x00, 0xF0]))

    # one MCU (16×16): DC scan order = Y(0,0) Y(0,1) Y(1,0) Y(1,1) Cb
    # Cr; per-component predictors (Y chains through all four blocks,
    # Cb and Cr start at 0).  Diffs all chosen in magnitude category 2
    # so every block emits huff('1') + two magnitude bits.
    diffs = [2, 3, -2, 2, 2, -3]  # Y,Y,Y,Y,Cb,Cr
    w = _BitWriter()
    for d in diffs:
        t, mag = _magnitude(d)
        assert t == 2
        w.write(1, 1)       # DC huff: symbol 2 → '1'
        w.write(mag, 2)     # magnitude bits
    w.flush()
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0])
    out += _seg(0xDA, sos) + w.out
    # AC scans: every band empty → one EOB0 per block
    for cid, nblocks in ((1, 4), (2, 1), (3, 1)):
        w = _BitWriter()
        for _ in range(nblocks):
            w.write(0, 1)  # AC huff: symbol 0x00 → '0'
        w.flush()
        out += _seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0])) + w.out
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    assert got.shape == (16, 16, 3)
    # expected: flat per block — Y blocks cumulative DC: 2, 5, 3, 5
    q = 8
    yv = {}  # (by, bx) -> luma value
    cum = 0
    for (by, bx), d in zip(((0, 0), (0, 1), (1, 0), (1, 1)), (2, 3, -2, 2)):
        cum += d
        yv[(by, bx)] = 128.0 + cum * q / 8.0
    cb = 128.0 + 2 * q / 8.0
    cr = 128.0 - 3 * q / 8.0
    for py in range(16):
        for px in range(16):
            y = yv[(py // 8, px // 8)]
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            exp = np.clip(np.rint([r, g, b]), 0, 255).astype(np.uint8)
            assert (got[py, px] == exp).all(), (py, px, got[py, px], exp)


def test_jpeg_bomb_guard():
    """SOF dims are untrusted 16-bit values: a tiny blob claiming a
    65535×65535 frame is refused before any allocation."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(
        0xC0, struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
    )
    with pytest.raises(ValueError, match="max-pixels"):
        decode_jpeg(bytes(out))
    # CPU-time ceiling (VP8L/VP8 discipline): a LEGAL 3000x3000 frame
    # is beyond the pure-Python entropy budget — PIL handoff, before
    # any entropy work
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(
        0xC0, struct.pack(">BHHB", 8, 3000, 3000, 1) + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="JPEG_MAX_PIXELS"):
        decode_jpeg(bytes(out))


def test_progressive_truncated_and_fill_bytes():
    """A progressive frame header with NO scan (crawl truncation) raises
    instead of fabricating a flat-gray image; fill bytes (0xFF runs)
    between a scan and the next marker are legal padding (T.81
    B.1.1.2)."""
    from tiledb_vector_search_spark.objects.jpeg import (
        encode_jpeg_progressive,
    )

    truncated = bytearray(b"\xff\xd8")
    truncated += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    truncated += _seg(
        0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    )
    truncated += b"\xff\xd9"
    with pytest.raises(ValueError, match="missing scan"):
        decode_jpeg(bytes(truncated))

    # inject fill bytes before every marker segment that follows a scan
    img = np.clip(
        np.cumsum(np.random.default_rng(5).integers(-5, 6, (16, 16)), axis=0)
        + 120, 0, 255,
    ).astype(np.uint8)
    blob = encode_jpeg_progressive(img, quality=85)
    want = decode_jpeg(blob)
    # insert two 0xFF fill bytes before each SOS after the first
    padded = blob.replace(b"\xff\xda", b"\xff\xff\xff\xda")
    # the FIRST SOS is preceded by a DHT segment end, also legal to pad
    got = decode_jpeg(padded)
    assert (got == want).all()


# --- 12-bit sample precision (T.81 extended sequential) ----------------------


def test_12bit_hand_built_dc_only_stream():
    """Hand-derived 12-bit stream, independent of our encoder: quant all
    1s (Pq=1), one 8x8 block whose DC diff is 7616 (category 13 — above
    the 8-bit table range), zero AC.  IDCT of a DC-only block is flat:
    7616/8 + 2048 = 3000 exactly, as uint16."""
    from tiledb_vector_search_spark.objects.jpeg import (
        _AC_PROG_BITS,
        _AC_PROG_VALS,
        _DC_EXT,
    )

    blob = bytearray(b"\xff\xd8")
    blob += _seg(
        0xDB, bytes([0x10]) + b"".join(struct.pack(">H", 1) for _ in range(64))
    )
    blob += _seg(0xC1, struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0]))
    blob += _seg(0xC4, bytes([0x00]) + bytes(_DC_EXT[0]) + bytes(_DC_EXT[1]))
    blob += _seg(
        0xC4, bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS)
    )
    blob += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy: DC cat 13 = canonical code 01101 (16 five-bit codes 0..15),
    # magnitude 7616 = 1110111000000 (13 bits), EOB = 0000000, pad 1s
    blob += bytes([0x6F, 0x70, 0x00, 0x7F])
    blob += b"\xff\xd9"
    out = decode_jpeg(bytes(blob))
    assert out.dtype == np.uint16
    assert out.shape == (8, 8)
    assert (out == 3000).all()


def test_12bit_flat_extremes_round_trip_exact():
    from tiledb_vector_search_spark.objects.jpeg import encode_jpeg

    for v in (0, 1, 2048, 4094, 4095):
        f = np.full((8, 8), v, np.uint16)
        out = decode_jpeg(encode_jpeg(f, quality=100, precision=12))
        assert out.dtype == np.uint16
        assert (out == v).all(), v


def test_12bit_round_trip_bounds():
    rng = np.random.default_rng(12)
    g = np.clip(
        np.linspace(0, 4095, 24 * 16).reshape(16, 24)
        + rng.integers(-300, 300, (16, 24)),
        0, 4095,
    ).astype(np.uint16)
    from tiledb_vector_search_spark.objects.jpeg import encode_jpeg

    out = decode_jpeg(encode_jpeg(g, quality=97, precision=12))
    assert out.dtype == np.uint16
    # q=97 luma quant entries are 1..2: error bound a few LSBs at 12 bits
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 16

    c = (rng.integers(0, 64, (17, 19, 3)) * 64).astype(np.uint16)
    outc = decode_jpeg(encode_jpeg(c, quality=95, precision=12))
    assert outc.dtype == np.uint16 and outc.shape == (17, 19, 3)
    assert np.abs(outc.astype(int) - c.astype(int)).max() <= 64


def test_12bit_decode_image_normalizes_to_uint8():
    """decode_image keeps the uniform uint8 contract by taking the high
    8 of the 12 bits — the same convention as 16-bit PNG."""
    from tiledb_vector_search_spark.objects.codecs import decode_image
    from tiledb_vector_search_spark.objects.jpeg import encode_jpeg

    f = np.full((8, 8), 2048, np.uint16)
    out = decode_image(encode_jpeg(f, quality=100, precision=12))
    assert out.dtype == np.uint8
    assert (out == 128).all()


def test_12bit_rejects_other_precisions():
    from tiledb_vector_search_spark.objects.jpeg import encode_jpeg

    with pytest.raises(ValueError, match="precision"):
        encode_jpeg(np.zeros((8, 8), np.uint16), precision=10)
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 4] = 16
    with pytest.raises(NotImplementedError, match="precision 16"):
        decode_jpeg(bytes(blob))


def test_truncated_scan_raises_valueerror_not_indexerror():
    """A scan cut off before any trailing marker byte must surface
    through the decoder's ValueError contract (the corruption-fuzz error
    taxonomy), not a bare IndexError from the bit reader (ADVICE r7).
    Cut points sweep the tail so both the byte-fill and the 0xFF-pair
    lookahead paths hit the end."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    blob = encode_jpeg(img, quality=85)
    assert blob.endswith(b"\xff\xd9")
    for cut in (3, 4, 5, 9, 17):
        trunc = blob[: len(blob) - cut]
        with pytest.raises(ValueError):
            decode_jpeg(trunc)


# --- round-9 self-review regressions ------------------------------------------


def _patch_sof_sampling(blob: bytes, hv: int) -> bytes:
    """Rewrite the single component's sampling factors in SOF0."""
    i = blob.index(b"\xff\xc0")
    # FF C0 len(2) prec(1) h(2) w(2) nc(1) cid(1) hv(1)
    assert blob[i + 9] == 1  # nc == 1 (grayscale)
    out = bytearray(blob)
    out[i + 11] = hv
    return bytes(out)


def test_single_component_2x2_sampling_decodes():
    """A grayscale frame declaring 2x2 sampling factors is legal: an
    Ns=1 scan is NON-interleaved, so the block grid is the component's
    own raster (hmax == ch cancels) and the entropy stream is identical
    to the 1x1 encoding.  Regression: the MCU-interleaved geometry
    decoded 4 blocks per MCU on a padded grid and desynced the huffman
    stream ('invalid JPEG huffman code')."""
    from tiledb_vector_search_spark.objects.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (21, 19)).astype(np.uint8)
    plain = encode_jpeg(img, quality=92)
    want = decode_jpeg(plain)
    got = decode_jpeg(_patch_sof_sampling(plain, 0x22))
    np.testing.assert_array_equal(got, want)


def test_multi_scan_sequential_decodes():
    """One SOS per component (non-interleaved sequential, legal T.81)
    must decode identically to the interleaved single-scan file.
    Regression: every scan iterated ALL frame components, crashing with
    KeyError on the first single-component scan."""
    import struct

    from tiledb_vector_search_spark.objects import jpeg as J

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (17, 13, 3)).astype(np.uint8)
    single = J.encode_jpeg(img, quality=90)
    want = J.decode_jpeg(single)

    # rebuild the same file as THREE single-component scans: headers up
    # to the original SOS, then per-component SOS + entropy re-encoded
    # from the identical coefficient grids
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    qts = [
        J._quality_scale(J._Q_LUMA, 90),
        J._quality_scale(J._Q_CHROMA, 90),
    ]
    zz_grids = J._component_zz(planes, qts, 17, 13)
    dc_enc = [
        J._build_encode_table(*J._DC_LUMA),
        J._build_encode_table(*J._DC_CHROMA),
    ]
    ac_enc = [
        J._build_encode_table(*J._AC_LUMA),
        J._build_encode_table(*J._AC_CHROMA),
    ]

    def scan_bytes(ci):
        tid = 0 if ci == 0 else 1
        wtr = J._BitWriter()
        pred = 0
        bh, bw = zz_grids[ci].shape[:2]
        for by in range(bh):
            for bx in range(bw):
                zz = zz_grids[ci][by, bx]
                diff = int(zz[0]) - pred
                pred = int(zz[0])
                t, mag = J._magnitude(diff)
                code, ln = dc_enc[tid][t]
                wtr.write(code, ln)
                if t:
                    wtr.write(mag, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[tid][0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    t2, mag2 = J._magnitude(v)
                    code, ln = ac_enc[tid][(run << 4) | t2]
                    wtr.write(code, ln)
                    wtr.write(mag2, t2)
                    run = 0
                if run:
                    code, ln = ac_enc[tid][0x00]
                    wtr.write(code, ln)
        wtr.flush()
        return bytes(wtr.out)

    sos_at = single.index(b"\xff\xda")
    out = bytearray(single[:sos_at])
    for ci in range(3):
        th = 0 if ci == 0 else 1
        sos = bytes([1, ci + 1, (th << 4) | th]) + b"\x00\x3f\x00"
        out += struct.pack(">BBH", 0xFF, 0xDA, len(sos) + 2) + sos
        out += scan_bytes(ci)
    out += b"\xff\xd9"
    got = J.decode_jpeg(bytes(out))
    np.testing.assert_array_equal(got, want)


def test_cmyk_component_count_raises():
    """4-component (Adobe CMYK) frames previously decoded to silently
    WRONG RGB (first three planes as YCbCr, K ignored)."""
    import struct

    from tiledb_vector_search_spark.objects import jpeg as J

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    blob = J.encode_jpeg(img)
    i = blob.index(b"\xff\xc0")
    out = bytearray(blob)
    # declare 4 components (header byte only — parsing must refuse
    # before reaching the malformed tail)
    out[i + 9] = 4
    with pytest.raises(NotImplementedError, match="components"):
        J.decode_jpeg(bytes(out))


def test_align_restart_truncation_raises_valueerror():
    """Truncation mid restart interval must raise ValueError (the
    corruption taxonomy callers filter on), not bare IndexError."""
    from tiledb_vector_search_spark.objects.jpeg import _BitReader

    r = _BitReader(b"\x12\x34\x56", 0)
    with pytest.raises(ValueError, match="truncated"):
        r.align_restart()
