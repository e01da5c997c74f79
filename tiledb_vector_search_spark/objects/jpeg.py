"""Baseline JPEG (JFIF) codec — dependency-free (stdlib + numpy).

Closes the remaining image-decode gap (`readers.py` previously needed
PIL for jpeg): crawled image corpora are dominated by baseline JFIF,
and decoding it needs nothing beyond huffman tables, dequantization, an
8×8 IDCT, and YCbCr→RGB — all expressible in numpy.

Scope (explicit):
- decode: baseline/extended sequential DCT (SOF0/1) AND progressive
  (SOF2 — spectral selection, successive approximation with DC/AC
  refinement scans, EOB runs), 8-bit, grayscale or YCbCr, 4:4:4 /
  4:2:2 / 4:2:0 sampling (nearest upsample), custom or spec
  huffman/quant tables, restart markers.  Arithmetic entropy coding
  (SOF9/SOF10, sequential + progressive) decodes natively via
  :mod:`jpeg_arith`; 12-bit sample precision decodes natively to
  uint16 (0..4095, level shift 2048, 16-bit Pq=1 quant tables).  Only
  the exotic processes (lossless, hierarchical) raise with a PIL hint.
- encode: 4:4:4 (or grayscale) baseline, plus a spectral-selection
  progressive encoder sharing the same quantized coefficients — enough
  to generate real JFIF test vectors, round-trip within quantization
  tolerance, and pin progressive==baseline decode equivalence.

Correctness strategy (no PIL in the sandbox to diff against): the
decoder is tested on handcrafted minimal streams with KNOWN pixel
answers (flat-color MCUs whose DC-only encoding is hand-derivable),
against the encoder only through lossy-round-trip ERROR BOUNDS (so an
inverse-pair bug cannot cancel), and the IDCT against the orthonormal
DCT matrix identity.
"""

from __future__ import annotations

import struct

import numpy as np

# CPU-time ceiling for the pure-Python entropy layers (Huffman AND
# arithmetic are per-symbol Python loops, ~0.05-0.3 MP/s) — the
# VP8L/VP8 guard discipline.  Dims above this (but under the memory
# guard) raise the PIL handoff instead of pinning a Spark task.
JPEG_MAX_PIXELS = 4_194_304

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 example quantization tables (luminance, chrominance)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 standard huffman tables: (bits[1..16], huffval)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct8() -> np.ndarray:
    k = np.arange(8)[:, None]
    i = np.arange(8)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / 16.0)
    m[0] *= 1.0 / np.sqrt(2)
    return m * 0.5  # orthonormal for n=8: sqrt(2/8) = 0.5


_D8 = _dct8()


def _idct2(block: np.ndarray) -> np.ndarray:
    return _D8.T @ block @ _D8


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _D8 @ block @ _D8.T


# --- huffman ------------------------------------------------------------------


def _build_decode_table(bits, huffval) -> list:
    """16-bit-prefix LUT for canonical JPEG codes: ``lut[peek16]`` is
    ``(value << 5) | code_length`` (0 = invalid prefix).  One list
    lookup decodes any symbol — the (length, code) dict walk this
    replaces paid a dict probe per BIT."""
    lut = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            entry = (huffval[k] << 5) | length
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = [entry] * (
                1 << (16 - length)
            )
            code += 1
            k += 1
        code <<= 1
    return lut


def _build_encode_table(bits, huffval) -> dict[int, tuple[int, int]]:
    """value -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at markers (restart markers are consumed by the caller)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        # mask consumed high bits BEFORE shifting: without it acc grows
        # into an ever-larger bignum over the scan and every shift turns
        # O(scan length) — accidentally quadratic decode
        if self.pos >= len(self.buf):
            # a scan that ends without a trailing marker byte: surface
            # through the decoder's ValueError contract, not a bare
            # IndexError (the corruption-fuzz error taxonomy)
            raise ValueError("truncated JPEG scan")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("truncated JPEG scan")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: feed padding bits (spec: 1-bits); decoder stops
                # via restart/scan-end handling before consuming garbage
                self.acc = (
                    (self.acc & ((1 << self.n) - 1)) << 8
                ) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = ((self.acc & ((1 << self.n) - 1)) << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def peek16(self) -> int:
        """16 lookahead bits (marker padding extends the tail) for the
        LUT symbol decode; pair with ``consume``."""
        while self.n < 16:
            self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def consume(self, k: int) -> None:
        self.n -= k

    def align_restart(self) -> None:
        """Discard to byte boundary and consume an RSTn marker.
        Truncation mid-interval raises ValueError — the corruption
        taxonomy every caller filters on (a bare IndexError here broke
        'except ValueError' blob isolation)."""
        self.n = 0
        end = len(self.buf) - 1
        while self.pos < end and (
            self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] == 0x00
        ):
            self.pos += 1
        if self.pos >= end:
            raise ValueError("truncated JPEG scan")
        m = self.buf[self.pos + 1]
        if 0xD0 <= m <= 0xD7:
            self.pos += 2
        # else: leave (scan end — EOI/next marker)


def _decode_huff(r: _BitReader, table) -> int:
    entry = table[r.peek16()]
    if entry == 0:
        raise ValueError("invalid JPEG huffman code")
    r.consume(entry & 31)
    return entry >> 5


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude per JPEG's EXTEND procedure."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decode -------------------------------------------------------------------


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode JFIF → (h, w) grayscale or (h, w, 3) RGB uint8.

    Baseline/extended sequential (SOF0/1) AND progressive (SOF2) —
    spectral selection, successive approximation (DC + AC refinement
    scans), EOB runs, restart intervals — plus their arithmetic-coded
    twins (SOF9/SOF10, T.81 Annex F/G via :mod:`jpeg_arith`).  8-bit
    frames decode to uint8; 12-bit frames to uint16 in 0..4095.  The
    exotic processes (lossless, hierarchical) raise with the PIL hint.
    """
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart = 0
    progressive = False
    arith = False
    from tiledb_vector_search_spark.objects.jpeg_arith import (
        ArithConditioning,
    )

    cond = ArithConditioning()
    saw_scan = False
    coefs: list[np.ndarray] | None = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = blob[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2 fill byte before a marker
            pos += 1
            continue
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        length = struct.unpack_from(">H", blob, pos + 2)[0]
        body = pos + 4
        data = blob[body : pos + 2 + length]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(data, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(data, ">u2", 64, i).astype(np.int64)
                    i += 128
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1 : i + 17])
                nv = sum(bits)
                huffval = list(data[i + 17 : i + 17 + nv])
                tab = _build_decode_table(bits, huffval)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):  # huffman + arith SOF
            prec, h, w, nc = data[0], *struct.unpack_from(">HH", data, 1), data[5]
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"JPEG sample precision {prec} unsupported"
                )
            from tiledb_vector_search_spark.objects.codecs import (
                PNG_MAX_PIXELS as _MAX_PX,
            )

            if h * w > _MAX_PX:
                # SOF dims are untrusted 16-bit values (up to 65535²
                # ≈ 4.3G pixels per plane); refuse before allocating
                raise ValueError(
                    f"JPEG dimensions {w}x{h} exceed the max-pixels guard"
                )
            if h * w > JPEG_MAX_PIXELS:
                # CPU-time ceiling, the VP8L/VP8 discipline (ADVICE r6):
                # both entropy layers are per-symbol pure Python
                # (~0.05-0.3 MP/s), so a legal 100 MP crawl blob would
                # pin a task for many minutes.  Between this ceiling and
                # the memory guard above, hand off to a C-speed decoder.
                raise NotImplementedError(
                    f"JPEG dimensions {w}x{h} exceed JPEG_MAX_PIXELS="
                    f"{JPEG_MAX_PIXELS} for the pure-Python entropy "
                    "path; decode with PIL"
                )
            if nc not in (1, 3):
                # the color pipeline supports grayscale and YCbCr; a
                # 4-component Adobe CMYK/YCCK frame previously decoded
                # to silently WRONG RGB (first three planes treated as
                # YCbCr, K ignored) and 2-component frames crashed
                raise NotImplementedError(
                    f"JPEG with {nc} components (CMYK/YCCK or exotic) "
                    "unsupported by the pure-Python path; decode with PIL"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + 3 * c], data[7 + 3 * c], data[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps, prec)
            if marker in (0xC9, 0xCA):
                arith = True
            if marker in (0xC2, 0xCA):
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                # zigzag-ordered coefficients, padded to the MCU grid,
                # accumulated ACROSS scans
                coefs = [
                    np.zeros((mcuy * cv * mcux * ch, 64), dtype=np.int64)
                    .reshape(mcuy * cv, mcux * ch, 64)
                    for _cid, ch, cv, _tq in comps
                ]
            else:
                # sequential: pixel planes accumulate ACROSS scans too —
                # T.81 allows one SOS per component (non-interleaved
                # sequential), not just the common single interleaved scan
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                seq_planes = [
                    np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
                    for _cid, ch, cv, _tq in comps
                ]
                seq_pending = {cid for cid, _ch, _cv, _tq in comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG process unsupported (install PIL)")
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            cond.parse_dac(data)
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", data, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            sel_list = []
            for s in range(ns):
                cs, tabs = data[1 + 2 * s], data[2 + 2 * s]
                sel_list.append((cs, (tabs >> 4, tabs & 0x0F)))
            if not progressive:
                if arith:
                    from tiledb_vector_search_spark.objects.jpeg_arith import (
                        decode_scan_arith,
                    )

                    pos = decode_scan_arith(
                        blob, pos + 2 + length, frame, dict(sel_list), qt,
                        cond, restart, seq_planes,
                    )
                    saw_scan = True
                    seq_pending -= {cs for cs, _t in sel_list}
                    if not seq_pending:
                        h, w, comps, prec = frame
                        hmax = max(c[1] for c in comps)
                        vmax = max(c[2] for c in comps)
                        return _planes_to_image(
                            seq_planes, comps, h, w, hmax, vmax, prec
                        )
                    continue
                pos = _decode_scan(
                    blob, pos + 2 + length, frame, dict(sel_list), qt,
                    dc_tabs, ac_tabs, restart, seq_planes,
                )
                saw_scan = True
                seq_pending -= {cs for cs, _t in sel_list}
                if not seq_pending:
                    h, w, comps, prec = frame
                    hmax = max(c[1] for c in comps)
                    vmax = max(c[2] for c in comps)
                    return _planes_to_image(
                        seq_planes, comps, h, w, hmax, vmax, prec
                    )
                continue
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            saw_scan = True
            if arith:
                from tiledb_vector_search_spark.objects.jpeg_arith import (
                    decode_progressive_scan_arith,
                )

                pos = decode_progressive_scan_arith(
                    blob, pos + 2 + length, frame, sel_list, cond,
                    restart, ss, se, ahal >> 4, ahal & 0x0F, coefs,
                )
            else:
                pos = _decode_progressive_scan(
                    blob, pos + 2 + length, frame, sel_list, dc_tabs,
                    ac_tabs, restart, ss, se, ahal >> 4, ahal & 0x0F, coefs,
                )
            continue
        pos += 2 + length
    if progressive and coefs is not None and saw_scan:
        return _reconstruct_progressive(frame, coefs, qt)
    # a frame header with no decoded scan (crawl truncation) must raise,
    # not fabricate a flat-gray canvas from all-zero coefficients
    raise ValueError("JPEG missing scan data")


def _marker_resync(buf: bytes, p: int) -> int:
    """Offset of the next REAL marker at/after ``p``: stuffed FF00 and
    RSTn are entropy-layer artifacts, 0xFF fill bytes (T.81 B.1.1.2)
    may pad before a marker.  THE one resync scanner — both entropy
    backends and both scan shapes ride it, so edge-case fixes cannot
    diverge between copies."""
    n = len(buf)
    while p + 1 < n:
        if buf[p] == 0xFF:
            if buf[p + 1] == 0xFF:
                p += 1
                continue
            if buf[p + 1] != 0x00 and not (0xD0 <= buf[p + 1] <= 0xD7):
                return p
        p += 1
    return p


def _decode_progressive_scan(
    buf, pos, frame, sel_list, dc_tabs, ac_tabs, restart, ss, se, ah, al,
    coefs,
):
    """One progressive scan: mutate the per-component zigzag coefficient
    grids; return the byte offset of the next marker.

    Spec semantics (ITU-T T.81 §G.2): DC-only scans may interleave
    components in MCU order; AC scans are single-component in the
    component's own block raster.  ``Ah=0`` scans set coefficients at
    ``<< Al``; ``Ah>0`` refinement scans append the next lower bit
    (EOB runs carry correction bits for already-nonzero coefficients).
    """
    h, w, comps, _prec = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_idx = {c[0]: i for i, c in enumerate(comps)}
    r = _BitReader(buf, pos)
    pred = [0] * len(comps)
    eobrun = 0

    def dc_first(blk, ci, dct):
        t = _decode_huff(r, dct)
        pred[ci] += _extend(r.bits(t), t)
        blk[0] = pred[ci] << al

    def dc_refine(blk):
        if r.bit():
            # two's-complement OR appends the magnitude bit for either
            # sign (Python negative ints behave as infinite two's
            # complement, same as the C reference decoders)
            blk[0] |= 1 << al

    def ac_first(blk, act):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_huff(r, act)
            rr, s_ = rs >> 4, rs & 0x0F
            if s_ == 0:
                if rr != 15:  # EOBn
                    eobrun = (1 << rr) - 1
                    if rr:
                        eobrun += r.bits(rr)
                    return
                k += 16  # ZRL
            else:
                k += rr
                if k > se:
                    raise ValueError("JPEG AC index overflow")
                blk[k] = _extend(r.bits(s_), s_) << al
                k += 1

    def ac_refine(blk, act):
        nonlocal eobrun
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff(r, act)
                rr, s_ = rs >> 4, rs & 0x0F
                val = 0
                if s_ == 0:
                    if rr != 15:  # EOBn
                        eobrun = 1 << rr
                        if rr:
                            eobrun += r.bits(rr)
                        break
                else:  # s_ must be 1 in a refinement scan
                    val = p1 if r.bit() else m1
                # advance over rr zero-history positions, emitting
                # correction bits for nonzero-history ones along the way
                while k <= se:
                    if blk[k] != 0:
                        if r.bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    if r.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            eobrun -= 1

    if ss == 0 and se != 0:
        # T.81 §G.1.1.1.1: a progressive DC scan has Se=0; a sequential
        # scan header (0..63) under an SOF2 frame is a malformed stream
        raise ValueError("invalid progressive scan header (Ss=0, Se!=0)")
    if ss > se or se > 63:
        raise ValueError("invalid progressive spectral selection")

    def unit(blk, ci, td, ta):
        if ss == 0:
            if ah == 0:
                dc_first(blk, ci, dc_tabs[td])
            else:
                dc_refine(blk)
        else:
            if ah == 0:
                ac_first(blk, ac_tabs[ta])
            else:
                ac_refine(blk, ac_tabs[ta])

    if len(sel_list) > 1:  # interleaved (DC-only scans)
        if ss != 0:
            raise ValueError("interleaved progressive AC scan is invalid")
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and count and count % restart == 0:
                    r.align_restart()
                    pred[:] = [0] * len(comps)
                    eobrun = 0
                for cs, (td, ta) in sel_list:
                    ci = comp_idx[cs]
                    _cid, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            unit(
                                coefs[ci][my * cv + by, mx * ch + bx],
                                ci, td, ta,
                            )
                count += 1
    else:  # single component: raster over the component's own blocks
        (cs, (td, ta)), = sel_list
        ci = comp_idx[cs]
        _cid, ch, cv, _tq = comps[ci]
        bw_c = -(-(-(-w * ch // hmax)) // 8)
        bh_c = -(-(-(-h * cv // vmax)) // 8)
        count = 0
        for by in range(bh_c):
            for bx in range(bw_c):
                if restart and count and count % restart == 0:
                    r.align_restart()
                    pred[ci] = 0
                    eobrun = 0
                unit(coefs[ci][by, bx], ci, td, ta)
                count += 1

    return _marker_resync(buf, r.pos)


def _reconstruct_progressive(frame, coefs, qt):
    h, w, comps, prec = frame
    mid = float(1 << (prec - 1))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for ci, (_cid, ch, cv, tq) in enumerate(comps):
        grid = coefs[ci]
        by_n, bx_n, _ = grid.shape
        plane = np.zeros((by_n * 8, bx_n * 8), dtype=np.float64)
        q = qt[tq]
        for by in range(by_n):
            for bx in range(bx_n):
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = grid[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(block.reshape(8, 8)) + mid
                )
        planes.append(plane)
    return _planes_to_image(planes, comps, h, w, hmax, vmax, prec)


def _decode_scan(buf, pos, frame, sel, qt, dc_tabs, ac_tabs, restart, planes):
    """Decode ONE sequential (SOF0/SOF1) scan into ``planes``; returns
    the position of the next marker after the scan's entropy data.

    Geometry per T.81: an Ns>1 scan interleaves the SCAN's components
    over the frame MCU grid; an Ns=1 scan is NON-interleaved — a plain
    raster over that component's own ceil-divided block grid, with NO
    MCU padding (a single-component frame declaring 2x2 sampling
    factors is legal and has 1 block per "MCU", not 4).  The first cut
    iterated ALL frame components in every scan: a multi-scan
    sequential file (one SOS per component) crashed with KeyError, and
    the 2x2-grayscale case walked a padded grid straight into a
    huffman desync.
    """
    h, w, comps, prec = frame
    mid = float(1 << (prec - 1))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    comp_idx = {cid: i for i, (cid, _ch, _cv, _tq) in enumerate(comps)}
    try:
        scan_cis = [comp_idx[cs] for cs in sel]
    except KeyError as exc:
        raise ValueError(
            f"JPEG scan references unknown component {exc.args[0]}"
        ) from None
    pred = {ci: 0 for ci in scan_cis}
    r = _BitReader(buf, pos)

    def decode_block_into(ci, by, bx):
        cid, _ch, _cv, tq = comps[ci]
        dct_t = dc_tabs[sel[cid][0]]
        act_t = ac_tabs[sel[cid][1]]
        q = qt[tq]
        coef = np.zeros(64, dtype=np.int64)
        t = _decode_huff(r, dct_t)
        diff = _extend(r.bits(t), t)
        pred[ci] += diff
        coef[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _decode_huff(r, act_t)
            rr, ss = rs >> 4, rs & 0x0F
            if ss == 0:
                if rr == 15:
                    k += 16
                    continue
                break  # EOB
            k += rr
            if k > 63:
                raise ValueError("JPEG AC index overflow")
            coef[k] = _extend(r.bits(ss), ss)
            k += 1
        block = np.zeros(64, dtype=np.float64)
        block[_ZIGZAG] = coef * q
        px = _idct2(block.reshape(8, 8)) + mid
        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px

    count = 0
    if len(scan_cis) == 1:
        ci = scan_cis[0]
        _cid, ch, cv, _tq = comps[ci]
        bw_c = -(-(-(-w * ch // hmax)) // 8)
        bh_c = -(-(-(-h * cv // vmax)) // 8)
        for by in range(bh_c):
            for bx in range(bw_c):
                if restart and count and count % restart == 0:
                    r.align_restart()
                    pred[ci] = 0
                decode_block_into(ci, by, bx)
                count += 1
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and count and count % restart == 0:
                    r.align_restart()
                    for ci in scan_cis:
                        pred[ci] = 0
                for ci in scan_cis:
                    _cid, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            decode_block_into(ci, my * cv + by, mx * ch + bx)
                count += 1

    return _marker_resync(buf, r.pos)


def _planes_to_image(planes, comps, h, w, hmax, vmax, prec=8):
    """Upsample to full resolution, crop, color-convert (shared by the
    sequential and progressive reconstruction paths).  8-bit frames
    yield uint8 in 0..255; 12-bit frames (T.81 extended precision)
    yield uint16 in 0..4095 with chroma centered at 2048."""
    mid = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    full = []
    for ci, (_cid, ch, cv, _tq) in enumerate(comps):
        p = planes[ci]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, maxv).astype(dtype)
    if len(full) != 3:
        raise ValueError(
            f"cannot color-convert {len(full)} JPEG components"
        )
    y, cb, cr = full[0], full[1] - mid, full[2] - mid
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, maxv).astype(dtype)


# --- encode -------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit magnitude code) for a coefficient value."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        return t, v + (1 << t) - 1
    return t, v


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, precision: int = 8
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB → sequential JFIF (4:4:4).

    ``precision=8`` (uint8 input) emits baseline SOF0.  ``precision=12``
    (uint16 input, 0..4095) emits T.81 extended sequential SOF1 with a
    16-bit (Pq=1) quantization table and extended Huffman tables whose
    categories cover the 12-bit coefficient range — the fixture source
    for the 12-bit decode tests, since neither the system libjpeg (an
    8-bit build) nor PIL can produce or read these."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    mid = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    x = np.asarray(pixels)
    want = np.uint8 if precision == 8 else np.uint16
    if x.dtype != want:
        x = np.clip(x, 0, maxv).astype(want)
    gray = x.ndim == 2
    h, w = x.shape[:2]
    if gray:
        planes = [x.astype(np.float64)]
    else:
        r, g, b = (x[:, :, i].astype(np.float64) for i in range(3))
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + mid
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + mid
        planes = [yy, cb, cr]
    qts = [_quality_scale(_Q_LUMA, quality)]
    if not gray:
        qts.append(_quality_scale(_Q_CHROMA, quality))

    if precision == 8:
        dc_tabs_spec = (_DC_LUMA, _DC_CHROMA)
        ac_tabs_spec = (_AC_LUMA, _AC_CHROMA)
    else:
        # the Annex-K tables stop at category 11 (DC) / 10 (AC); 12-bit
        # coefficients need the full range, so use complete custom
        # tables: DC categories 0..16, AC the 256-symbol table
        dc_tabs_spec = (_DC_EXT, _DC_EXT)
        ac_tabs_spec = (
            (_AC_PROG_BITS, _AC_PROG_VALS),
            (_AC_PROG_BITS, _AC_PROG_VALS),
        )
    dc_enc = [_build_encode_table(*t) for t in dc_tabs_spec]
    ac_enc = [_build_encode_table(*t) for t in ac_tabs_spec]

    wtr = _BitWriter()
    pred = [0] * len(planes)
    bh, bw = -(-h // 8), -(-w // 8)
    zz_grids = _component_zz(planes, qts, h, w, mid=mid)
    for by in range(bh):
        for bx in range(bw):
            for ci in range(len(planes)):
                tid = 0 if ci == 0 else 1
                zz = zz_grids[ci][by, bx]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, mag = _magnitude(diff)
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
                    t, mag = _magnitude(v)
                    code, ln = ac_enc[tid][(run << 4) | t]
                    wtr.write(code, ln)
                    wtr.write(mag, t)
                    run = 0
                if run:
                    code, ln = ac_enc[tid][0x00]
                    wtr.write(code, ln)
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    if precision == 8:
        # JFIF is defined for 8-bit samples only; 12-bit streams are
        # raw interchange-format JPEG (SOF1) without the APP0
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qts):
        if precision == 8:
            out += seg(0xDB, bytes([tid]) + bytes(int(v) for v in q))
        else:  # Pq=1: 16-bit table entries (values unchanged)
            out += seg(
                0xDB,
                bytes([0x10 | tid])
                + b"".join(struct.pack(">H", int(v)) for v in q),
            )
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += seg(0xC0 if precision == 8 else 0xC1, sof)
    for tc, tabs in ((0, dc_tabs_spec), (1, ac_tabs_spec)):
        for th in range(1 if gray else 2):
            bits, huffval = tabs[th]
            out += seg(
                0xC4,
                bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval),
            )
    sos = bytes([nc])
    for c in range(nc):
        th = 0 if c == 0 else 1
        sos += bytes([c + 1, (th << 4) | th])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# custom complete 256-symbol AC table for progressive scans: the Annex-K
# baseline AC tables lack the EOBn symbols (0x10..0xE0), so progressive
# scans need their own DHT.  1@7 + 253@8 + 2@9 bits — Kraft-complete.
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 1, 253, 2, 0, 0, 0, 0, 0, 0, 0]
_AC_PROG_VALS = list(range(256))

# extended DC table for 12-bit precision: difference categories 0..16
# (Annex-K's DC tables stop at 11).  16@5 + 1@6 bits.
_DC_EXT = ([0, 0, 0, 0, 16, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
           list(range(17)))


def _component_zz(planes, qts, h, w, mid=128.0):
    """Per-component (bh, bw, 64) zigzag-quantized coefficient grids —
    the ONE coefficient front half (block extract, edge-replicate,
    FDCT, quantize) of BOTH encoders (4:4:4).  ``mid`` is the level
    shift (128 for 8-bit, 2048 for 12-bit) — the sequential encoder
    used to inline this loop and the two copies had to stay identical
    by parallel edits; now the progressive/sequential coefficient
    equality holds by construction."""
    bh, bw = -(-h // 8), -(-w // 8)
    out = []
    for ci, p in enumerate(planes):
        q = qts[0 if ci == 0 else 1]
        zz = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = np.full((8, 8), 0.0)
                ys, xs = by * 8, bx * 8
                sub = p[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                blk[: sub.shape[0], : sub.shape[1]] = sub
                if sub.shape[0] < 8:
                    blk[sub.shape[0] :, :] = blk[sub.shape[0] - 1, :]
                if sub.shape[1] < 8:
                    blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1][:, None]
                coef = _fdct2(blk - mid)
                zz[by, bx] = np.rint(coef.reshape(64)[_ZIGZAG] / q).astype(
                    np.int64
                )
        out.append(zz)
    return out


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 85) -> bytes:
    """(h, w) gray or (h, w, 3) uint8 RGB → PROGRESSIVE JFIF (4:4:4).

    Spectral-selection progression (Al=0): one interleaved DC scan, then
    two AC scans per component (1-5, 6-63) with EOB-run accumulation.
    Coefficients are identical to :func:`encode_jpeg` at the same
    quality, so ``decode_jpeg(progressive) == decode_jpeg(baseline)``
    exactly — the equivalence the decoder tests pin.
    """
    x = np.asarray(pixels)
    if x.dtype != np.uint8:
        x = np.clip(x, 0, 255).astype(np.uint8)
    gray = x.ndim == 2
    h, w = x.shape[:2]
    if gray:
        planes = [x.astype(np.float64)]
    else:
        r, g, b = (x[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qts = [_quality_scale(_Q_LUMA, quality)]
    if not gray:
        qts.append(_quality_scale(_Q_CHROMA, quality))
    zzs = _component_zz(planes, qts, h, w)
    nc = len(planes)
    bh, bw = zzs[0].shape[:2]

    dc_enc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_enc = _build_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qts):
        out += seg(0xDB, bytes([tid]) + bytes(int(v) for v in q))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += seg(0xC2, sof)
    for th in range(1 if gray else 2):
        bits, huffval = (_DC_LUMA, _DC_CHROMA)[th]
        out += seg(0xC4, bytes([th]) + bytes(bits) + bytes(huffval))
    out += seg(
        0xC4, bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS)
    )

    # scan 1: interleaved DC, Al=0
    wtr = _BitWriter()
    pred = [0] * nc
    for by in range(bh):
        for bx in range(bw):
            for ci in range(nc):
                tid = 0 if ci == 0 else 1
                diff = int(zzs[ci][by, bx, 0]) - pred[ci]
                pred[ci] = int(zzs[ci][by, bx, 0])
                t, mag = _magnitude(diff)
                code, ln = dc_enc[tid][t]
                wtr.write(code, ln)
                if t:
                    wtr.write(mag, t)
    wtr.flush()
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, (0 if c == 0 else 1) << 4])
    sos += bytes([0, 0, 0])
    out += seg(0xDA, sos) + wtr.out

    # AC scans per component: spectral bands 1-5 and 6-63, Al=0
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            wtr = _BitWriter()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun <= 0:
                    return
                n = eobrun.bit_length() - 1
                code, ln = ac_enc[n << 4]
                wtr.write(code, ln)
                if n:
                    wtr.write(eobrun - (1 << n), n)
                eobrun = 0

            for by in range(bh):
                for bx in range(bw):
                    band = zzs[ci][by, bx, ss : se + 1]
                    nz = np.nonzero(band)[0]
                    if len(nz) == 0:
                        eobrun += 1
                        if eobrun == 32767:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    last = int(nz[-1])
                    for k in range(se - ss + 1):
                        v = int(band[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[0xF0]
                            wtr.write(code, ln)
                            run -= 16
                        t, mag = _magnitude(v)
                        code, ln = ac_enc[(run << 4) | t]
                        wtr.write(code, ln)
                        wtr.write(mag, t)
                        run = 0
                        if k == last:
                            break
                    if last < se - ss:
                        eobrun += 1
                        if eobrun == 32767:
                            flush_eob()
            flush_eob()
            wtr.flush()
            tid = 0 if ci == 0 else 1
            sos = bytes([1, ci + 1, (tid << 4) | 0, ss, se, 0])
            out += seg(0xDA, sos) + wtr.out

    out += b"\xff\xd9"
    return bytes(out)
