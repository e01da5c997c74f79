"""Baseline JPEG (JFIF) codec — dependency-free (stdlib + numpy).

Closes the remaining image-decode gap (`readers.py` previously needed
PIL for jpeg): crawled image corpora are dominated by baseline JFIF,
and decoding it needs nothing beyond huffman tables, dequantization, an
8×8 IDCT, and YCbCr→RGB — all expressible in numpy.

Scope (explicit):
- decode: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr,
  one interleaved scan, 4:4:4 / 4:2:2 / 4:2:0 sampling (nearest
  upsample), custom or spec huffman/quant tables, restart markers.
  Progressive (SOF2), arithmetic coding, and 12-bit raise with a PIL
  hint — the PNG codec has no carve-outs left (all depths + Adam7 native).
- encode: 4:4:4 (or grayscale), Annex-K example quantization tables
  scaled by a quality factor, Annex-K standard huffman tables — enough
  to generate real JFIF test vectors and round-trip within
  quantization tolerance.

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


def _build_decode_table(bits, huffval) -> dict[tuple[int, int], int]:
    """(length, code) -> value; canonical JPEG code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


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
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: feed padding bits (spec: 1-bits); decoder stops
                # via restart/scan-end handling before consuming garbage
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Discard to byte boundary and consume an RSTn marker."""
        self.n = 0
        while self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.buf[self.pos + 1]
        if 0xD0 <= m <= 0xD7:
            self.pos += 2
        # else: leave (scan end — EOI/next marker)


def _decode_huff(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude per JPEG's EXTEND procedure."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decode -------------------------------------------------------------------


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode baseline JFIF → (h, w) grayscale or (h, w, 3) RGB uint8."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = blob[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
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
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline+extended sequential
            prec, h, w, nc = data[0], *struct.unpack_from(">HH", data, 1), data[5]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG unsupported (PIL)")
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + 3 * c], data[7 + 3 * c], data[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG unsupported (install PIL)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG process unsupported (install PIL)")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", data, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            sel = {}
            for s in range(ns):
                cs, tabs = data[1 + 2 * s], data[2 + 2 * s]
                sel[cs] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(
                blob, pos + 2 + length, frame, sel, qt, dc_tabs, ac_tabs,
                restart,
            )
        elif marker == 0xD9:
            break
        pos += 2 + length
    raise ValueError("JPEG missing scan data")


def _decode_scan(buf, pos, frame, sel, qt, dc_tabs, ac_tabs, restart):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for _cid, ch, cv, _tq in comps:
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64))
    pred = [0] * len(comps)
    r = _BitReader(buf, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                r.align_restart()
                pred = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dct_t = dc_tabs[sel[cid][0]]
                act_t = ac_tabs[sel[cid][1]]
                q = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
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
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution, crop, color-convert
    full = []
    for ci, (_cid, ch, cv, _tq) in enumerate(comps):
        p = planes[ci]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


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


def encode_jpeg(pixels: np.ndarray, quality: int = 85) -> bytes:
    """(h, w) gray or (h, w, 3) uint8 RGB → baseline JFIF (4:4:4)."""
    x = np.asarray(pixels)
    if x.dtype != np.uint8:
        x = np.clip(x, 0, 255).astype(np.uint8)
    gray = x.ndim == 2
    h, w = x.shape[:2]
    if gray:
        planes = [x.astype(np.float64)]
    else:
        r, g, b = (x[:, :, i].astype(np.float64) for i in range(3))
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [yy, cb, cr]
    qts = [_quality_scale(_Q_LUMA, quality)]
    if not gray:
        qts.append(_quality_scale(_Q_CHROMA, quality))

    dc_enc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_enc = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]

    wtr = _BitWriter()
    pred = [0] * len(planes)
    bh, bw = -(-h // 8), -(-w // 8)
    for by in range(bh):
        for bx in range(bw):
            for ci, p in enumerate(planes):
                tid = 0 if ci == 0 else 1
                q = qts[tid]
                blk = np.full((8, 8), 0.0)
                ys, xs = by * 8, bx * 8
                sub = p[ys : min(ys + 8, h), xs : min(xs + 8, w)]
                blk[: sub.shape[0], : sub.shape[1]] = sub
                # edge-replicate partial blocks (avoids ringing vs zeros)
                if sub.shape[0] < 8:
                    blk[sub.shape[0] :, :] = blk[sub.shape[0] - 1, :]
                if sub.shape[1] < 8:
                    blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1][:, None]
                coef = _fdct2(blk - 128.0)
                zz = np.rint(coef.reshape(64)[_ZIGZAG] / q).astype(np.int64)
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
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qts):
        out += seg(0xDB, bytes([tid]) + bytes(int(v) for v in q))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += seg(0xC0, sof)
    for tc, tabs in ((0, (_DC_LUMA, _DC_CHROMA)), (1, (_AC_LUMA, _AC_CHROMA))):
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
