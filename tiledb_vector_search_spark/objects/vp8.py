"""Lossy VP8 (intra/keyframe) decoder — pure stdlib + numpy, RFC 6386.

Closes the last mainstream codec gap (VERDICT r6 "What's missing #2"):
lossy ``VP8 `` is the dominant WebP flavor in crawl data and previously
fell through to the PIL hint.  WebP still images are ALWAYS keyframes
(no inter prediction, no motion vectors, no golden/altref), so this
implements the complete keyframe subset of RFC 6386:

- boolean arithmetic decoder (§7),
- keyframe headers: segmentation, loop-filter params, token partitions,
  quantizer indices, coefficient-probability updates (§9),
- intra mode parsing with the keyframe trees/contexts (§11),
- token/coefficient decode with the default probability tables,
  coefficient bands, and extra-bit categories (§13),
- dequantization (§14.1), inverse WHT for Y2 (§14.3), the 4×4 inverse
  DCT with the 20091/35468 fixed-point constants (§14.4),
- all 16×16/8×8 modes and the ten 4×4 B_PRED modes with the 127/129
  edge conventions (§12),
- the in-loop deblocking filter, both simple and normal, with
  per-segment/delta-adjusted levels (§15).

The decode core (everything through the loop filter) is validated
BIT-FOR-BIT against the system libwebp's own decode on libwebp-encoded
fixtures when the shared library is present (``tests/test_vp8_codec.py``
compares raw Y/U/V planes via ``WebPDecodeYUV``), plus hand-built
streams with hand-derived pixels that need no reference decoder.  The
default probability tables live in :mod:`vp8_tables` (RFC 6386
normative constants; see ``tools/extract_vp8_tables.py``).

YUV 4:2:0 → RGB uses BT.601 limited-range with nearest-neighbor chroma
upsampling — spec-level color conversion (libwebp's fancy upsampler
differs by ≤2 LSB at chroma edges), which is exactly what the
perceptual consumers (LumaGrid, pHash, near-dup) need; the lossy codec
parity gate pairs a lossy re-encode with its PNG original through
``image_near_duplicates``.

Scale/CPU posture: the token loop is per-coefficient pure Python, so
like VP8L the guard must bound TIME, not just memory —
``VP8_MAX_PIXELS`` (4 MP) sits far below the PNG memory guard; larger
legal images defer to PIL via NotImplementedError.
"""

from __future__ import annotations

import numpy as np

from tiledb_vector_search_spark.objects.vp8_tables import (
    AC_QLOOKUP,
    CAT_PROBS,
    COEFF_BANDS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
    KF_UV_PROBS,
    KF_YMODE_PROBS,
    ZIGZAG,
)

# introspection: mode/skip maps of the last decoded frame (tests)
_last_debug: dict = {}
# when True, _last_debug also captures per-MB coefficient blocks
_capture_blocks = False

# CPU-time bomb guard (see module docstring)
VP8_MAX_PIXELS = 4_194_304

# --- trees (RFC 6386 §8.2, §11.2, §13.2) -------------------------------------

# luma modes: DC=0 V=1 H=2 TM=3 B_PRED=4
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]

# 4x4 modes: order per RFC intra_bmode enum
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)
BMODE_TREE = [
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
]
# 16x16 mode → implied uniform 4x4 mode (for B_PRED context)
MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# token ids: DCT_0..4 = 0..4, cat1..6 = 5..10, EOB = 11
COEFF_TREE = [
    -11, 2,
    -0, 4,
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10,
]
_CAT_BASE = {5: 5, 6: 7, 7: 11, 8: 19, 9: 35, 10: 67}


class BoolDecoder:
    """RFC 6386 §7 boolean arithmetic decoder."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8) | data[1] if len(data) >= 2 else (
            (data[0] << 8) if data else 0
        )
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        # hot path (one call per bool decision, several per coefficient):
        # registers in locals, one attribute write-back per decision
        rng = self.range
        value = self.value
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        if value >= big:
            ret = 1
            rng -= split
            value -= big
        else:
            ret = 0
            rng = split
        if rng < 128:
            bit_count = self.bit_count
            pos = self.pos
            data = self.data
            n = len(data)
            while rng < 128:
                value <<= 1
                rng <<= 1
                bit_count += 1
                if bit_count == 8:
                    bit_count = 0
                    if pos < n:
                        value |= data[pos]
                    pos += 1
            self.bit_count = bit_count
            self.pos = pos
        self.range = rng
        self.value = value
        return ret

    def bit(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit() else v

    def flagged_signed(self, n: int) -> int:
        """RFC header idiom: 1 flag bit, then a signed n-bit literal."""
        return self.signed_literal(n) if self.bit() else 0

    def tree(self, tree: list, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


class _FrameHeader:
    pass


def _parse_header(payload: bytes) -> "_FrameHeader":
    h = _FrameHeader()
    if len(payload) < 10:
        raise ValueError("VP8 payload too short")
    b0, b1, b2 = payload[0], payload[1], payload[2]
    if b0 & 1:
        raise ValueError("VP8 still images must be keyframes")
    h.show = (b0 >> 4) & 1
    h.part1_size = (b0 >> 5) | (b1 << 3) | (b2 << 11)
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w_raw = payload[6] | (payload[7] << 8)
    h_raw = payload[8] | (payload[9] << 8)
    h.width, h.height = w_raw & 0x3FFF, h_raw & 0x3FFF
    if h.width == 0 or h.height == 0:
        raise ValueError("bad VP8 dimensions")
    if h.width * h.height > VP8_MAX_PIXELS:
        # CPU-time guard: the token loop is per-coefficient pure Python
        raise NotImplementedError(
            f"VP8 dimensions {h.width}x{h.height} exceed VP8_MAX_PIXELS="
            f"{VP8_MAX_PIXELS} for the pure-Python path; decode with PIL "
            "when installed (CPU-time guard, not a format gap)"
        )
    first = payload[10 : 10 + h.part1_size]
    if len(first) < h.part1_size:
        raise ValueError("truncated VP8 first partition")
    bd = BoolDecoder(first)
    h.bd = bd
    bd.bit()  # color space (must be 0 for webp, tolerated)
    bd.bit()  # clamping type

    # segmentation (§9.3)
    h.segmentation = bd.bit()
    h.update_mb_seg_map = 0
    h.seg_probs = [255, 255, 255]
    h.seg_abs = 0
    h.seg_q = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    if h.segmentation:
        h.update_mb_seg_map = bd.bit()
        update_data = bd.bit()
        if update_data:
            h.seg_abs = bd.bit()
            h.seg_q = [bd.flagged_signed(7) for _ in range(4)]
            h.seg_lf = [bd.flagged_signed(6) for _ in range(4)]
        if h.update_mb_seg_map:
            h.seg_probs = [
                bd.literal(8) if bd.bit() else 255 for _ in range(3)
            ]

    # loop filter (§9.4)
    h.filter_type = bd.bit()  # 1 = simple
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bd.bit()
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.bit():  # mode_ref_lf_delta_update
            h.ref_lf_delta = [bd.flagged_signed(6) for _ in range(4)]
            h.mode_lf_delta = [bd.flagged_signed(6) for _ in range(4)]

    # token partitions (§9.5)
    h.log2_parts = bd.literal(2)
    h.num_parts = 1 << h.log2_parts

    # quantizer indices (§9.6)
    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = bd.flagged_signed(4)
    h.y2_dc_delta = bd.flagged_signed(4)
    h.y2_ac_delta = bd.flagged_signed(4)
    h.uv_dc_delta = bd.flagged_signed(4)
    h.uv_ac_delta = bd.flagged_signed(4)

    bd.bit()  # refresh entropy probs (no effect for a still keyframe)

    # coefficient probability updates (§9.9 / §13.4)
    probs = [
        [[list(c) for c in band] for band in plane] for plane in COEFF_PROBS
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.get(COEFF_UPDATE_PROBS[i][j][k][l]):
                        probs[i][j][k][l] = bd.literal(8)
    h.coeff_probs = probs

    h.mb_no_skip = bd.bit()
    h.prob_skip = bd.literal(8) if h.mb_no_skip else 0
    return h


# --- dequantization (§14.1) ---------------------------------------------------


def _dequant_factors(h: "_FrameHeader", seg: int):
    if h.segmentation:
        base = h.seg_q[seg] if h.seg_abs else h.y_ac_qi + h.seg_q[seg]
    else:
        base = h.y_ac_qi
    base = _clamp_q(base)
    y1dc = DC_QLOOKUP[_clamp_q(base + h.y_dc_delta)]
    y1ac = AC_QLOOKUP[base]
    y2dc = DC_QLOOKUP[_clamp_q(base + h.y2_dc_delta)] * 2
    y2ac = AC_QLOOKUP[_clamp_q(base + h.y2_ac_delta)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(base + h.uv_dc_delta)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(base + h.uv_ac_delta)]
    return (y1dc, y1ac), (y2dc, y2ac), (uvdc, uvac)


# --- transforms (§14.3, §14.4) ------------------------------------------------


def _inv_wht(ip: list) -> list:
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, <<16
_C2 = 35468  # sin(pi/8)*sqrt(2), <<16


def _inv_dct(ip: list) -> np.ndarray:
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# --- token decoding (§13) -----------------------------------------------------


def _decode_coeffs(
    bd: BoolDecoder, probs, plane: int, ctx: int, first: int, dq
) -> "tuple[list | None, int]":
    """Decode one 4×4 block's coefficients.  Returns (dequantized
    coefficient list in raster order or None if all-zero, nonzero_flag).
    """
    out = None
    i = first
    skip_eob = False
    nonzero = 0
    while i < 16:
        band_probs = probs[plane][COEFF_BANDS[i]][ctx]
        # after a zero token the next read cannot be EOB: enter the tree
        # below the EOB branch (index 2)
        idx = 2 if skip_eob else 0
        t = idx
        while True:
            t = COEFF_TREE[t + bd.get(band_probs[t >> 1])]
            if t <= 0:
                break
        token = -t
        if token == 11:  # EOB
            break
        if token == 0:
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if token <= 4:
            value = token
            ctx = 1 if value == 1 else 2
        else:
            cat = CAT_PROBS[token - 5]
            extra = 0
            for p in cat:
                extra = (extra << 1) | bd.get(p)
            value = _CAT_BASE[token] + extra
            ctx = 2
        if bd.bit():
            value = -value
        if out is None:
            out = [0] * 16
        zz = ZIGZAG[i]
        out[zz] = value * (dq[0] if zz == 0 else dq[1])
        nonzero = 1
        i += 1
    return out, nonzero


# --- intra prediction (§12) ---------------------------------------------------


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_block16_or_8(plane, x0, y0, n, mode):
    """n×n whole-plane intra prediction (Y 16×16 / chroma 8×8)."""
    have_above = y0 > 0
    have_left = x0 > 0
    if mode == DC_PRED:
        if have_above and have_left:
            s = int(plane[y0 - 1, x0 : x0 + n].sum()) + int(
                plane[y0 : y0 + n, x0 - 1].sum()
            )
            v = (s + n) >> (5 if n == 16 else 4)
        elif have_above:
            v = (int(plane[y0 - 1, x0 : x0 + n].sum()) + (n >> 1)) >> (
                4 if n == 16 else 3
            )
        elif have_left:
            v = (int(plane[y0 : y0 + n, x0 - 1].sum()) + (n >> 1)) >> (
                4 if n == 16 else 3
            )
        else:
            v = 128
        return np.full((n, n), v, dtype=np.int32)
    if mode == V_PRED:
        above = (
            plane[y0 - 1, x0 : x0 + n].astype(np.int32)
            if have_above
            else np.full(n, 127, dtype=np.int32)
        )
        return np.tile(above, (n, 1))
    if mode == H_PRED:
        left = (
            plane[y0 : y0 + n, x0 - 1].astype(np.int32)
            if have_left
            else np.full(n, 129, dtype=np.int32)
        )
        return np.tile(left[:, None], (1, n))
    # TM_PRED
    above = (
        plane[y0 - 1, x0 : x0 + n].astype(np.int32)
        if have_above
        else np.full(n, 127, dtype=np.int32)
    )
    left = (
        plane[y0 : y0 + n, x0 - 1].astype(np.int32)
        if have_left
        else np.full(n, 129, dtype=np.int32)
    )
    # corner: the synthetic above row (127) covers it whenever there is
    # no real above; the synthetic left column (129) covers it only for
    # left-edge MBs that DO have a real above row
    if not have_above:
        p = 127
    elif not have_left:
        p = 129
    else:
        p = int(plane[y0 - 1, x0 - 1])
    return np.clip(left[:, None] + above[None, :] - p, 0, 255)


def _decode_vp8_planes(payload: bytes):
    """Full keyframe decode → (Y, U, V) uint8 planes at padded MB size,
    cropped to (height, width); returns (y, u, v, width, height)."""
    h = _parse_header(payload)
    bd = h.bd
    mbw = (h.width + 15) >> 4
    mbh = (h.height + 15) >> 4

    # token partitions: sizes after part1, then the data
    off = 10 + h.part1_size
    sizes = []
    for _ in range(h.num_parts - 1):
        if off + 3 > len(payload):
            raise ValueError("truncated VP8 partition size table")
        sizes.append(
            payload[off] | (payload[off + 1] << 8) | (payload[off + 2] << 16)
        )
        off += 3
    parts = []
    for s in sizes:
        parts.append(BoolDecoder(payload[off : off + s]))
        off += s
    parts.append(BoolDecoder(payload[off:]))

    # --- pass 1: mode parsing for every MB (all in partition 1) -------
    seg_ids = np.zeros((mbh, mbw), dtype=np.int8)
    y_modes = np.zeros((mbh, mbw), dtype=np.int8)
    uv_modes = np.zeros((mbh, mbw), dtype=np.int8)
    skips = np.zeros((mbh, mbw), dtype=np.int8)
    b_modes = np.zeros((mbh, mbw, 4, 4), dtype=np.int8)
    for my in range(mbh):
        for mx in range(mbw):
            if h.update_mb_seg_map:
                p = h.seg_probs
                if bd.get(p[0]):
                    seg_ids[my, mx] = 2 + bd.get(p[2])
                else:
                    seg_ids[my, mx] = bd.get(p[1])
            if h.mb_no_skip:
                skips[my, mx] = bd.get(h.prob_skip)
            ym = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            y_modes[my, mx] = ym
            if ym == B_PRED:
                for sy in range(4):
                    for sx in range(4):
                        above = (
                            int(b_modes[my - 1, mx, 3, sx])
                            if sy == 0
                            else int(b_modes[my, mx, sy - 1, sx])
                        ) if (sy > 0 or my > 0) else B_DC
                        left = (
                            int(b_modes[my, mx - 1, sy, 3])
                            if sx == 0
                            else int(b_modes[my, mx, sy, sx - 1])
                        ) if (sx > 0 or mx > 0) else B_DC
                        b_modes[my, mx, sy, sx] = bd.tree(
                            BMODE_TREE, KF_BMODE_PROBS[above][left]
                        )
            else:
                b_modes[my, mx, :, :] = MODE_TO_B[ym]
            uv_modes[my, mx] = bd.tree(UV_MODE_TREE, KF_UV_PROBS)

    # --- pass 2: coefficients + reconstruction ------------------------
    yw, yh = mbw * 16, mbh * 16
    Y = np.zeros((yh, yw), dtype=np.uint8)
    U = np.zeros((yh // 2, yw // 2), dtype=np.uint8)
    V = np.zeros((yh // 2, yw // 2), dtype=np.uint8)

    # nonzero-context flags: per MB column/row, per subblock lane
    # [y2, y0..y15, u0..u3, v0..v3] → track above (per mb col) and left
    above_nz = np.zeros((mbw, 9), dtype=np.int8)  # y2, 4 y lanes, 2u, 2v
    # lanes: 0=y2, 1-4=y cols, 5-6=u cols, 7-8=v cols
    probs = h.coeff_probs
    coeffs_store = {}
    has_coeffs = np.zeros((mbh, mbw), dtype=np.int8)
    filter_levels = np.zeros((mbh, mbw), dtype=np.int16)

    for my in range(mbh):
        td = parts[my % h.num_parts]
        left_nz = np.zeros(9, dtype=np.int8)
        for mx in range(mbw):
            seg = int(seg_ids[my, mx])
            dq_y1, dq_y2, dq_uv = _dequant_factors(h, seg)
            ym = int(y_modes[my, mx])
            skip = bool(skips[my, mx])
            blocks = {}
            mb_nonzero = 0
            if not skip:
                if ym != B_PRED:
                    ctx = int(above_nz[mx, 0]) + int(left_nz[0])
                    y2, nz = _decode_coeffs(td, probs, 1, ctx, 0, dq_y2)
                    above_nz[mx, 0] = left_nz[0] = nz
                    mb_nonzero |= nz
                    dc16 = _inv_wht(y2 or [0] * 16)
                    first, ytype = 1, 0
                else:
                    dc16 = None
                    first, ytype = 0, 3
                for sy in range(4):
                    for sx in range(4):
                        ctx = int(above_nz[mx, 1 + sx]) + int(
                            left_nz[1 + sy]
                        )
                        blk, nz = _decode_coeffs(
                            td, probs, ytype, ctx, first, dq_y1
                        )
                        if dc16 is not None:
                            if blk is None:
                                if dc16[4 * sy + sx]:
                                    blk = [0] * 16
                            if blk is not None:
                                blk[0] = dc16[4 * sy + sx]
                        above_nz[mx, 1 + sx] = left_nz[1 + sy] = nz
                        mb_nonzero |= nz
                        if blk is not None:
                            blocks[("y", sy, sx)] = blk
                for pi, pname in ((0, "u"), (1, "v")):
                    for sy in range(2):
                        for sx in range(2):
                            lane = 5 + 2 * pi + sx
                            llane = 5 + 2 * pi + sy
                            ctx = int(above_nz[mx, lane]) + int(
                                left_nz[llane]
                            )
                            blk, nz = _decode_coeffs(
                                td, probs, 2, ctx, 0, dq_uv
                            )
                            above_nz[mx, lane] = left_nz[llane] = nz
                            mb_nonzero |= nz
                            if blk is not None:
                                blocks[(pname, sy, sx)] = blk
            else:
                # skipped MB: AC nonzero contexts reset; the Y2 context
                # resets only when the MB HAS a Y2 block (16×16 modes) —
                # a skipped B_PRED MB leaves the Y2 context untouched
                # (libwebp's nz_dc handling)
                above_nz[mx, 1:] = 0
                left_nz[1:] = 0
                if ym != B_PRED:
                    above_nz[mx, 0] = left_nz[0] = 0
            has_coeffs[my, mx] = mb_nonzero
            if _capture_blocks:
                coeffs_store[(my, mx)] = dict(blocks) if not skip else {}

            # loop-filter level for this MB (§15.1)
            if h.segmentation:
                lvl = (
                    h.seg_lf[seg]
                    if h.seg_abs
                    else h.filter_level + h.seg_lf[seg]
                )
            else:
                lvl = h.filter_level
            if h.lf_delta_enabled:
                lvl += h.ref_lf_delta[0]  # intra frame
                if ym == B_PRED:
                    lvl += h.mode_lf_delta[0]
            filter_levels[my, mx] = max(0, min(63, lvl))

            # --- reconstruction ---------------------------------------
            x0, y0 = mx * 16, my * 16
            if ym != B_PRED:
                pred = _pred_block16_or_8(Y, x0, y0, 16, ym)
                for sy in range(4):
                    for sx in range(4):
                        blk = blocks.get(("y", sy, sx))
                        py, px = y0 + 4 * sy, x0 + 4 * sx
                        if blk is None:
                            res = 0
                        elif not any(blk[1:]):
                            res = (blk[0] + 4) >> 3
                        else:
                            res = _inv_dct(blk)
                        out = pred[4 * sy : 4 * sy + 4, 4 * sx : 4 * sx + 4] + res
                        Y[py : py + 4, px : px + 4] = np.clip(out, 0, 255)
            else:
                # above row beyond the MB (for above-right): saved from
                # the frame row above — the spec uses the MB-above row
                # for ALL subblock rows
                tr_row = np.full(4, 127, dtype=np.int32)
                if y0 > 0:
                    if x0 + 20 <= yw:
                        tr_row = Y[y0 - 1, x0 + 16 : x0 + 20].astype(np.int32)
                    else:
                        # rightmost MB: no MB to the above-right —
                        # replicate the last above pixel
                        tr_row = np.full(
                            4, int(Y[y0 - 1, yw - 1]), dtype=np.int32
                        )
                for sy in range(4):
                    for sx in range(4):
                        py, px = y0 + 4 * sy, x0 + 4 * sx
                        mode = int(b_modes[my, mx, sy, sx])
                        pred4 = _pred_b4(Y, px, py, mode, h, tr_row, sx, sy)
                        blk = blocks.get(("y", sy, sx))
                        if blk is None:
                            res = 0
                        elif not any(blk[1:]):
                            res = (blk[0] + 4) >> 3
                        else:
                            res = _inv_dct(blk)
                        Y[py : py + 4, px : px + 4] = np.clip(
                            pred4 + res, 0, 255
                        )
            cx0, cy0 = mx * 8, my * 8
            um = int(uv_modes[my, mx])
            for pname, plane in (("u", U), ("v", V)):
                pred = _pred_block16_or_8(plane, cx0, cy0, 8, um)
                for sy in range(2):
                    for sx in range(2):
                        blk = blocks.get((pname, sy, sx))
                        py, px = cy0 + 4 * sy, cx0 + 4 * sx
                        if blk is None:
                            res = 0
                        elif not any(blk[1:]):
                            res = (blk[0] + 4) >> 3
                        else:
                            res = _inv_dct(blk)
                        out = pred[4 * sy : 4 * sy + 4, 4 * sx : 4 * sx + 4] + res
                        plane[py : py + 4, px : px + 4] = np.clip(out, 0, 255)

    # debug/introspection hook (tests assert on mode coverage)
    global _last_debug
    _last_debug = {
        "y_modes": y_modes.copy(), "uv_modes": uv_modes.copy(),
        "skips": skips.copy(), "seg_ids": seg_ids.copy(),
        "b_modes": b_modes.copy(), "filter_levels": filter_levels.copy(),
        "header": h, "blocks": coeffs_store,
    }

    # --- loop filter (§15) --------------------------------------------
    if h.filter_level > 0 or h.segmentation or h.lf_delta_enabled:
        _loop_filter(
            h, Y, U, V, mbw, mbh, filter_levels, has_coeffs, y_modes, skips
        )
    return Y, U, V, h.width, h.height


def _pred_b4(Y, px, py, mode, h, tr_row, sx, sy):
    """One 4×4 B_PRED subblock prediction (§12.3).

    ``tr_row``: the 4 above-right pixels of the MB (from the MB-above
    frame row), used for col-3 subblocks on every row — the spec quirk
    that interior subblocks never use just-reconstructed right-neighbor
    pixels for above-right."""
    have_above = py > 0
    have_left = px > 0
    A = (
        Y[py - 1, px : px + 4].astype(np.int32)
        if have_above
        else np.full(4, 127, dtype=np.int32)
    )
    if sx == 3:
        # col-3 subblocks ALWAYS take above-right from the MB-above row
        # (the spec quirk; tr_row is 127s when there is no above MB)
        AR = tr_row
    else:
        AR = (
            Y[py - 1, px + 4 : px + 8].astype(np.int32)
            if have_above
            else np.full(4, 127, dtype=np.int32)
        )
    L = (
        Y[py : py + 4, px - 1].astype(np.int32)
        if have_left
        else np.full(4, 129, dtype=np.int32)
    )
    if not have_above:
        P = 127  # synthetic above row covers the corner
    elif not have_left:
        P = 129  # left-edge subblock with a real above row
    else:
        P = int(Y[py - 1, px - 1])
    out = np.empty((4, 4), dtype=np.int32)
    if mode == B_DC:
        v = (int(A.sum()) + int(L.sum()) + 4) >> 3
        out[:] = v
    elif mode == B_TM:
        out[:] = np.clip(L[:, None] + A[None, :] - P, 0, 255)
    elif mode == B_VE:
        row = np.array(
            [
                _avg3(P, A[0], A[1]),
                _avg3(A[0], A[1], A[2]),
                _avg3(A[1], A[2], A[3]),
                _avg3(A[2], A[3], AR[0]),
            ],
            dtype=np.int32,
        )
        out[:] = row[None, :]
    elif mode == B_HE:
        col = np.array(
            [
                _avg3(P, L[0], L[1]),
                _avg3(L[0], L[1], L[2]),
                _avg3(L[1], L[2], L[3]),
                _avg3(L[2], L[3], L[3]),
            ],
            dtype=np.int32,
        )
        out[:] = col[:, None]
    elif mode == B_LD:
        a = [int(x) for x in A] + [int(x) for x in AR]
        e = [
            _avg3(a[0], a[1], a[2]),
            _avg3(a[1], a[2], a[3]),
            _avg3(a[2], a[3], a[4]),
            _avg3(a[3], a[4], a[5]),
            _avg3(a[4], a[5], a[6]),
            _avg3(a[5], a[6], a[7]),
            _avg3(a[6], a[7], a[7]),
        ]
        for r in range(4):
            for c in range(4):
                out[r, c] = e[r + c]
    elif mode == B_RD:
        e = [int(L[3]), int(L[2]), int(L[1]), int(L[0]), P] + [
            int(x) for x in A
        ]
        f = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(7)]
        for r in range(4):
            for c in range(4):
                out[r, c] = f[3 - r + c]
    elif mode == B_VR:
        e = [int(L[3]), int(L[2]), int(L[1]), int(L[0]), P] + [
            int(x) for x in A
        ]
        # interleaved whole/half-step diagonals
        g = {}
        g[(0, 0)] = _avg2(e[4], e[5])
        g[(0, 1)] = _avg2(e[5], e[6])
        g[(0, 2)] = _avg2(e[6], e[7])
        g[(0, 3)] = _avg2(e[7], e[8])
        g[(1, 0)] = _avg3(e[3], e[4], e[5])
        g[(1, 1)] = _avg3(e[4], e[5], e[6])
        g[(1, 2)] = _avg3(e[5], e[6], e[7])
        g[(1, 3)] = _avg3(e[6], e[7], e[8])
        g[(2, 0)] = _avg3(e[2], e[3], e[4])
        g[(3, 0)] = _avg3(e[1], e[2], e[3])
        for r in range(2, 4):
            for c in range(1, 4):
                g[(r, c)] = g[(r - 2, c - 1)]
        for (r, c), v in g.items():
            out[r, c] = v
    elif mode == B_VL:
        a = [int(x) for x in A] + [int(x) for x in AR]
        g = {}
        g[(0, 0)] = _avg2(a[0], a[1])
        g[(0, 1)] = _avg2(a[1], a[2])
        g[(0, 2)] = _avg2(a[2], a[3])
        g[(0, 3)] = _avg2(a[3], a[4])
        g[(1, 0)] = _avg3(a[0], a[1], a[2])
        g[(1, 1)] = _avg3(a[1], a[2], a[3])
        g[(1, 2)] = _avg3(a[2], a[3], a[4])
        g[(1, 3)] = _avg3(a[3], a[4], a[5])
        g[(2, 0)] = g[(0, 1)]
        g[(2, 1)] = g[(0, 2)]
        g[(2, 2)] = g[(0, 3)]
        g[(3, 0)] = g[(1, 1)]
        g[(3, 1)] = g[(1, 2)]
        g[(3, 2)] = g[(1, 3)]
        g[(2, 3)] = _avg3(a[4], a[5], a[6])
        g[(3, 3)] = _avg3(a[5], a[6], a[7])
        for (r, c), v in g.items():
            out[r, c] = v
    elif mode == B_HD:
        e = [int(L[3]), int(L[2]), int(L[1]), int(L[0]), P] + [
            int(x) for x in A
        ]
        g = {}
        g[(3, 0)] = _avg2(e[0], e[1])
        g[(3, 1)] = _avg3(e[0], e[1], e[2])
        g[(2, 0)] = _avg2(e[1], e[2])
        g[(2, 1)] = _avg3(e[1], e[2], e[3])
        g[(1, 0)] = _avg2(e[2], e[3])
        g[(1, 1)] = _avg3(e[2], e[3], e[4])
        g[(0, 0)] = _avg2(e[3], e[4])
        g[(0, 1)] = _avg3(e[3], e[4], e[5])
        g[(0, 2)] = _avg3(e[4], e[5], e[6])
        g[(0, 3)] = _avg3(e[5], e[6], e[7])
        for r in range(1, 4):
            for c in range(2, 4):
                g[(r, c)] = g[(r - 1, c - 2)]
        for (r, c), v in g.items():
            out[r, c] = v
    elif mode == B_HU:
        l = [int(x) for x in L]
        g = {}
        g[(0, 0)] = _avg2(l[0], l[1])
        g[(0, 1)] = _avg3(l[0], l[1], l[2])
        g[(0, 2)] = _avg2(l[1], l[2])
        g[(0, 3)] = _avg3(l[1], l[2], l[3])
        g[(1, 0)] = g[(0, 2)]
        g[(1, 1)] = g[(0, 3)]
        g[(1, 2)] = _avg2(l[2], l[3])
        g[(1, 3)] = _avg3(l[2], l[3], l[3])
        g[(2, 0)] = g[(1, 2)]
        g[(2, 1)] = g[(1, 3)]
        g[(2, 2)] = l[3]
        g[(2, 3)] = l[3]
        g[(3, 0)] = l[3]
        g[(3, 1)] = l[3]
        g[(3, 2)] = l[3]
        g[(3, 3)] = l[3]
        for (r, c), v in g.items():
            out[r, c] = v
    else:
        raise ValueError(f"bad b mode {mode}")
    return out


# --- loop filter (§15) --------------------------------------------------------


def _common_adjust(use_outer, p1, p0, q0, q1):
    """RFC 15.2 common filter: returns (new p0, new q0, a) with 3/4-tap
    adjustment; inputs/outputs are value arrays shifted to signed."""
    a = np.clip(
        np.where(use_outer, np.clip(p1 - q1, -128, 127), 0)
        + 3 * (q0 - p0),
        -128,
        127,
    )
    f1 = np.clip(a + 4, -128, 127) >> 3
    f2 = np.clip(a + 3, -128, 127) >> 3
    return (
        np.clip(p0 + f2, -128, 127),
        np.clip(q0 - f1, -128, 127),
        f1,
    )


def _filter_segment(plane, pos, axis, length, mb_edge, interior, edge_lim,
                    hev_t, simple):
    """Filter one edge line at ``pos`` (columns if axis=1 else rows) over
    ``length`` lanes, per RFC 15.2-15.4, vectorized across lanes."""

    def get(o):
        if axis == 1:
            return plane[:length, pos + o].astype(np.int32)
        return plane[pos + o, :length].astype(np.int32)

    def put(o, v):
        if axis == 1:
            plane[:length, pos + o] = v.astype(np.uint8)
        else:
            plane[pos + o, :length] = v.astype(np.uint8)

    p3, p2, p1, p0 = get(-4), get(-3), get(-2), get(-1)
    q0, q1, q2, q3 = get(0), get(1), get(2), get(3)

    if simple:
        mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= edge_lim
        sp1, sp0, sq0, sq1 = map(_u2s_arr, (p1, p0, q0, q1))
        np0, nq0, _ = _common_adjust(True, sp1, sp0, sq0, sq1)
        put(-1, np.where(mask, _s2u_arr(np0), p0))
        put(0, np.where(mask, _s2u_arr(nq0), q0))
        return

    mask = (
        ((np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= edge_lim)
        & (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q3 - q2) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q1 - q0) <= interior)
    )
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    sp3, sp2, sp1, sp0, sq0, sq1, sq2, sq3 = map(
        _u2s_arr, (p3, p2, p1, p0, q0, q1, q2, q3)
    )

    if not mb_edge:
        # subblock filter: common adjust (outer taps iff hev), then the
        # +1>>1 roll-off applied to p1/q1 where NOT hev
        a = np.clip(
            np.where(hev, np.clip(sp1 - sq1, -128, 127), 0)
            + 3 * (sq0 - sp0),
            -128, 127,
        )
        f1 = np.clip(a + 4, -128, 127) >> 3
        f2 = np.clip(a + 3, -128, 127) >> 3
        np0 = np.clip(sp0 + f2, -128, 127)
        nq0 = np.clip(sq0 - f1, -128, 127)
        a2 = (np.clip(f1 + 1, -128, 127)) >> 1
        np1 = np.where(hev, sp1, np.clip(sp1 + a2, -128, 127))
        nq1 = np.where(hev, sq1, np.clip(sq1 - a2, -128, 127))
        for o, old, new in (
            (-2, p1, np1), (-1, p0, np0), (0, q0, nq0), (1, q1, nq1)
        ):
            put(o, np.where(mask, _s2u_arr(new), old))
        return

    # MB edge filter (§15.3): hev lanes get the common 2-pixel adjust,
    # non-hev lanes the wide 6-tap w-filter
    a = np.clip(
        np.clip(sp1 - sq1, -128, 127) + 3 * (sq0 - sp0), -128, 127
    )
    f1 = np.clip(a + 4, -128, 127) >> 3
    f2 = np.clip(a + 3, -128, 127) >> 3
    hev_p0 = np.clip(sp0 + f2, -128, 127)
    hev_q0 = np.clip(sq0 - f1, -128, 127)

    w = np.clip(np.clip(sp1 - sq1, -128, 127) + 3 * (sq0 - sp0), -128, 127)
    a_ = (27 * w + 63) >> 7
    wq0 = np.clip(sq0 - a_, -128, 127)
    wp0 = np.clip(sp0 + a_, -128, 127)
    a_ = (18 * w + 63) >> 7
    wq1 = np.clip(sq1 - a_, -128, 127)
    wp1 = np.clip(sp1 + a_, -128, 127)
    a_ = (9 * w + 63) >> 7
    wq2 = np.clip(sq2 - a_, -128, 127)
    wp2 = np.clip(sp2 + a_, -128, 127)

    np2 = np.where(hev, sp2, wp2)
    np1 = np.where(hev, sp1, wp1)
    np0 = np.where(hev, hev_p0, wp0)
    nq0 = np.where(hev, hev_q0, wq0)
    nq1 = np.where(hev, sq1, wq1)
    nq2 = np.where(hev, sq2, wq2)
    for o, old, new in (
        (-3, p2, np2), (-2, p1, np1), (-1, p0, np0),
        (0, q0, nq0), (1, q1, nq1), (2, q2, nq2),
    ):
        put(o, np.where(mask, _s2u_arr(new), old))


def _u2s_arr(x):
    return x - 128


def _s2u_arr(x):
    return x + 128


def _filter_limits(level: int, sharpness: int):
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        cap = 9 - sharpness
        if interior > cap:
            interior = cap
    if interior < 1:
        interior = 1
    hev = 0
    if level >= 40:
        hev = 2
    elif level >= 15:
        hev = 1
    # keyframe: hev threshold bumps differ for inter frames only
    mb_edge_lim = (level + 2) * 2 + interior
    sub_edge_lim = level * 2 + interior
    return interior, mb_edge_lim, sub_edge_lim, hev


def _loop_filter(h, Y, U, V, mbw, mbh, levels, has_coeffs, y_modes, skips):
    simple = h.filter_type == 1
    for my in range(mbh):
        for mx in range(mbw):
            level = int(levels[my, mx])
            if level == 0:
                continue
            interior, mb_lim, sub_lim, hev_t = _filter_limits(
                level, h.sharpness
            )
            inner = bool(has_coeffs[my, mx]) or (
                int(y_modes[my, mx]) == B_PRED
            )
            x0, y0 = mx * 16, my * 16
            cx0, cy0 = mx * 8, my * 8


            # vertical edges (left MB edge, then inner x=4,8,12)
            if mx > 0:
                _filter_segment(
                    Y[y0 : y0 + 16, :], x0, 1, 16, True,
                    interior, mb_lim, hev_t, simple,
                )
            if inner:
                for dx in (4, 8, 12):
                    _filter_segment(
                        Y[y0 : y0 + 16, :], x0 + dx, 1, 16, False,
                        interior, sub_lim, hev_t, simple,
                    )
            if not simple:
                if mx > 0:
                    _filter_segment(U[cy0 : cy0 + 8, :], cx0, 1, 8, True,
                                    interior, mb_lim, hev_t, False)
                    _filter_segment(V[cy0 : cy0 + 8, :], cx0, 1, 8, True,
                                    interior, mb_lim, hev_t, False)
                if inner:
                    _filter_segment(U[cy0 : cy0 + 8, :], cx0 + 4, 1, 8,
                                    False, interior, sub_lim, hev_t, False)
                    _filter_segment(V[cy0 : cy0 + 8, :], cx0 + 4, 1, 8,
                                    False, interior, sub_lim, hev_t, False)
            # horizontal edges (top MB edge, then inner y=4,8,12)
            if my > 0:
                _filter_segment(
                    Y[:, x0 : x0 + 16], y0, 0, 16, True,
                    interior, mb_lim, hev_t, simple,
                )
            if inner:
                for dy in (4, 8, 12):
                    _filter_segment(
                        Y[:, x0 : x0 + 16], y0 + dy, 0, 16, False,
                        interior, sub_lim, hev_t, simple,
                    )
            if not simple:
                if my > 0:
                    _filter_segment(U[:, cx0 : cx0 + 8], cy0, 0, 8, True,
                                    interior, mb_lim, hev_t, False)
                    _filter_segment(V[:, cx0 : cx0 + 8], cy0, 0, 8, True,
                                    interior, mb_lim, hev_t, False)
                if inner:
                    _filter_segment(U[:, cx0 : cx0 + 8], cy0 + 4, 0, 8,
                                    False, interior, sub_lim, hev_t, False)
                    _filter_segment(V[:, cx0 : cx0 + 8], cy0 + 4, 0, 8,
                                    False, interior, sub_lim, hev_t, False)


# --- public API ---------------------------------------------------------------


def decode_vp8_yuv(payload: bytes):
    """VP8 keyframe payload → (Y, U, V) uint8 planes cropped to the
    visible frame (the bit-exactness surface vs libwebp)."""
    Y, U, V, w, h = _decode_vp8_planes(payload)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    return Y[:h, :w], U[:ch, :cw], V[:ch, :cw]


def decode_vp8(payload: bytes) -> np.ndarray:
    """VP8 keyframe payload → (h, w, 4) uint8 RGBA (BT.601 limited
    range, nearest-neighbor chroma upsampling)."""
    y, u, v = decode_vp8_yuv(payload)
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    c = y.astype(np.int32) - 16
    d = uu.astype(np.int32) - 128
    e = vv.astype(np.int32) - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = np.clip(r, 0, 255)
    out[:, :, 1] = np.clip(g, 0, 255)
    out[:, :, 2] = np.clip(b, 0, 255)
    out[:, :, 3] = 255
    return out
