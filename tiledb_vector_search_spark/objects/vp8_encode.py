"""Minimal lossy-VP8 (keyframe) encoder — test-fixture generator.

The deliberately-simple encoder half of the VP8 codec pair (the
``encode_vp8l`` role for the lossy path): boolean arithmetic writer
(RFC 6386 §7.1 inverse), keyframe header with every optional feature
OFF, all-B_PRED or all-16×16 modes, and exact token encoding of given
quantized coefficients with the default probability tables.  Produces
VALID (not minimal) streams used to

- pin the decoder against hand-derived pixel expectations with no
  reference decoder in the loop, and
- three-way differential-test interpretation details: a stream this
  encoder writes is decoded by BOTH the system libwebp and our decoder,
  and any disagreement localizes the misread spec feature.

Not a production encoder: no RD search, no probability adaptation, no
segmentation, one token partition.
"""

from __future__ import annotations

import numpy as np

from tiledb_vector_search_spark.objects.vp8 import (
    BMODE_TREE,
    COEFF_TREE,
    KF_YMODE_TREE,
    UV_MODE_TREE,
    _CAT_BASE,
)
from tiledb_vector_search_spark.objects.vp8_tables import (
    CAT_PROBS,
    COEFF_BANDS,
    KF_BMODE_PROBS,
    KF_UV_PROBS,
    KF_YMODE_PROBS,
    ZIGZAG,
)


class BoolEncoder:
    """RFC 6386 §7 boolean arithmetic encoder (bit-exact inverse of
    :class:`vp8.BoolDecoder`).

    Implemented over an ARBITRARY-PRECISION interval: ``low`` is a big
    int in units of 2^-(nbits+8) and the C implementations' carry
    propagation / byte-at-a-time emission disappears — ``finish`` just
    serializes the final interval's lower bound.  Obviously correct by
    construction and pinned against the decoder by a randomized
    round-trip property test.
    """

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 0

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.nbits += 1

    def put_bit(self, bit: int) -> None:
        self.put(bit, 128)

    def put_literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put_bit((v >> i) & 1)

    def put_signed(self, v: int, n: int) -> None:
        self.put_literal(abs(v), n)
        self.put_bit(1 if v < 0 else 0)

    def put_flagged_signed(self, v: int, n: int) -> None:
        if v == 0:
            self.put_bit(0)
        else:
            self.put_bit(1)
            self.put_signed(v, n)

    def put_tree(self, tree: list, probs, token: int) -> None:
        # find the path to leaf -token by walking every node
        path = self._path(tree, token)
        i = 0
        for b in path:
            self.put(b, probs[i >> 1])
            i = tree[i + b]

    @staticmethod
    def _path(tree: list, token: int) -> list:
        # DFS for the leaf's bit path
        def walk(i, acc):
            for b in (0, 1):
                nxt = tree[i + b]
                if nxt <= 0:
                    if -nxt == token:
                        return acc + [b]
                else:
                    r = walk(nxt, acc + [b])
                    if r is not None:
                        return r
            return None

        out = walk(0, [])
        if out is None:
            raise ValueError(f"token {token} not in tree")
        return out

    def finish(self) -> bytes:
        # the decoder's value window carries 8 fractional guard bits
        # beyond the emitted renorm bits; any number in [low, low+range)
        # decodes identically — serialize low<<8 over nbits+16 bits,
        # zero-padded to whole bytes
        total_bits = self.nbits + 16
        nbytes = (total_bits + 7) // 8
        v = (self.low << 8) << (nbytes * 8 - total_bits)
        return v.to_bytes(nbytes, "big")


def _encode_block_tokens(
    be: BoolEncoder, coeffs: list, probs, plane: int, ctx: int, first: int
) -> int:
    """Encode one 4×4 block's quantized coefficients (raster order,
    UN-dequantized integers); returns the nonzero flag."""
    # convert to scan order
    scan = [coeffs[ZIGZAG[i]] for i in range(16)]
    last = -1
    for i in range(first, 16):
        if scan[i]:
            last = i
    nonzero = 1 if last >= first else 0
    i = first
    skip_eob = False
    while i < 16:
        band_probs = probs[plane][COEFF_BANDS[i]][ctx]
        if i > last:
            # EOB (only legal when the previous token was not DCT_0)
            be.put_tree(COEFF_TREE, band_probs, 11)
            return nonzero
        v = scan[i]
        a = abs(v)
        if a == 0:
            token = 0
        elif a <= 4:
            token = a
        elif a <= 6:
            token = 5
        elif a <= 10:
            token = 6
        elif a <= 18:
            token = 7
        elif a <= 34:
            token = 8
        elif a <= 66:
            token = 9
        else:
            token = 10
        if skip_eob:
            # emit the path from node 2 (EOB branch unavailable)
            path = BoolEncoder._path(COEFF_TREE, token)
            assert path[0] == 1, "post-zero token cannot be EOB"
            node = 2
            for b in path[1:]:
                be.put(b, band_probs[node >> 1])
                node = COEFF_TREE[node + b]
        else:
            be.put_tree(COEFF_TREE, band_probs, token)
        if a == 0:
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if token >= 5:
            extra = a - _CAT_BASE[token]
            cat = CAT_PROBS[token - 5]
            for bi, p in enumerate(cat):
                be.put((extra >> (len(cat) - 1 - bi)) & 1, p)
        be.put_bit(1 if v < 0 else 0)
        ctx = 1 if a == 1 else 2
        i += 1
    return nonzero


def encode_vp8_frame(
    width: int,
    height: int,
    y_ac_qi: int = 4,
    ymode: int = 0,
    uv_mode: int = 0,
    b_modes=None,
    y_blocks=None,
    y2_blocks=None,
    uv_blocks=None,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
) -> bytes:
    """Build a VP8 keyframe payload.

    ``ymode``: 16×16 mode for every MB, or ``B_PRED`` with ``b_modes``
    (dict (my,mx,sy,sx) → mode, default B_DC).  Coefficient dicts map
    (my,mx,...) → 16 raster-order QUANTIZED integers: ``y_blocks``
    (my,mx,sy,sx), ``y2_blocks`` (my,mx), ``uv_blocks``
    (plane, my,mx,sy,sx) with plane "u"/"v".  All-zero when absent.
    """
    from tiledb_vector_search_spark.objects.vp8 import (
        B_PRED as BP,
        MODE_TO_B,
    )
    from tiledb_vector_search_spark.objects.vp8_tables import (
        COEFF_PROBS,
        COEFF_UPDATE_PROBS,
    )

    mbw, mbh = (width + 15) >> 4, (height + 15) >> 4
    b_modes = b_modes or {}
    y_blocks = y_blocks or {}
    y2_blocks = y2_blocks or {}
    uv_blocks = uv_blocks or {}

    # ---- first partition: header + modes
    be = BoolEncoder()
    be.put_bit(0)  # color space
    be.put_bit(0)  # clamping
    be.put_bit(0)  # no segmentation
    be.put_bit(filter_type)
    be.put_literal(filter_level, 6)
    be.put_literal(sharpness, 3)
    be.put_bit(0)  # no lf deltas
    be.put_literal(0, 2)  # one token partition
    be.put_literal(y_ac_qi, 7)
    for _ in range(5):
        be.put_bit(0)  # all quantizer deltas zero
    be.put_bit(0)  # refresh entropy probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    be.put(0, COEFF_UPDATE_PROBS[i][j][k][l])
    be.put_bit(0)  # mb_no_coeff_skip disabled

    bmode_grid = np.zeros((mbh, mbw, 4, 4), dtype=np.int8)
    for my in range(mbh):
        for mx in range(mbw):
            be.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
            if ymode == BP:
                for sy in range(4):
                    for sx in range(4):
                        above = (
                            int(bmode_grid[my - 1, mx, 3, sx])
                            if sy == 0
                            else int(bmode_grid[my, mx, sy - 1, sx])
                        ) if (sy > 0 or my > 0) else 0
                        left = (
                            int(bmode_grid[my, mx - 1, sy, 3])
                            if sx == 0
                            else int(bmode_grid[my, mx, sy, sx - 1])
                        ) if (sx > 0 or mx > 0) else 0
                        m = int(b_modes.get((my, mx, sy, sx), 0))
                        be.put_tree(
                            BMODE_TREE, KF_BMODE_PROBS[above][left], m
                        )
                        bmode_grid[my, mx, sy, sx] = m
            else:
                bmode_grid[my, mx, :, :] = MODE_TO_B[ymode]
            be.put_tree(UV_MODE_TREE, KF_UV_PROBS, uv_mode)
    # pad: libwebp's bool reader preloads up to 8 bytes past the
    # declared partition size before checking eof — real encoders'
    # partitions always carry that slack, so must ours
    part1 = be.finish() + b"\x00" * 8

    # ---- token partition
    te = BoolEncoder()
    above_nz = np.zeros((mbw, 9), dtype=np.int8)
    for my in range(mbh):
        left_nz = np.zeros(9, dtype=np.int8)
        for mx in range(mbw):
            if ymode != BP:
                ctx = int(above_nz[mx, 0]) + int(left_nz[0])
                nz = _encode_block_tokens(
                    te, y2_blocks.get((my, mx), [0] * 16),
                    COEFF_PROBS, 1, ctx, 0,
                )
                above_nz[mx, 0] = left_nz[0] = nz
                first, ytype = 1, 0
            else:
                first, ytype = 0, 3
            for sy in range(4):
                for sx in range(4):
                    ctx = int(above_nz[mx, 1 + sx]) + int(left_nz[1 + sy])
                    nz = _encode_block_tokens(
                        te, y_blocks.get((my, mx, sy, sx), [0] * 16),
                        COEFF_PROBS, ytype, ctx, first,
                    )
                    above_nz[mx, 1 + sx] = left_nz[1 + sy] = nz
            for pi, pname in ((0, "u"), (1, "v")):
                for sy in range(2):
                    for sx in range(2):
                        lane = 5 + 2 * pi + sx
                        llane = 5 + 2 * pi + sy
                        ctx = int(above_nz[mx, lane]) + int(left_nz[llane])
                        nz = _encode_block_tokens(
                            te,
                            uv_blocks.get((pname, my, mx, sy, sx), [0] * 16),
                            COEFF_PROBS, 2, ctx, 0,
                        )
                        above_nz[mx, lane] = left_nz[llane] = nz
    part2 = te.finish() + b"\x00" * 8

    tag = 0 | (0 << 1) | (1 << 4) | (len(part1) << 5)
    header = bytes(
        [tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF]
    ) + b"\x9d\x01\x2a" + bytes(
        [width & 0xFF, (width >> 8) & 0x3F, height & 0xFF, (height >> 8) & 0x3F]
    )
    return header + part1 + part2


def wrap_webp(vp8_payload: bytes) -> bytes:
    """RIFF/WEBP container around a raw ``VP8 `` chunk payload — the
    ONE framing implementation (webp.py's), not a private copy whose
    padding/size handling could drift."""
    from tiledb_vector_search_spark.objects.webp import (
        _riff_chunk,
        _riff_container,
    )

    return _riff_container(_riff_chunk(b"VP8 ", vp8_payload))


def encode_vp8_lossy_image(img: np.ndarray, y_ac_qi: int = 8) -> bytes:
    """Lossy re-encode of a real image → RIFF/WEBP bytes.

    The image-level encoder the near-dup parity gate needs (a lossy
    re-encode of a PNG original must land next to it in pHash/embedding
    space): B_PRED with all-B_DC subblocks, reconstruction-in-the-loop
    — each 4×4 residual is transformed with the least-squares inverse
    of the decoder's OWN fixed-point IDCT, quantized, then de-quantized
    and inverse-transformed to keep encoder/decoder prediction state
    identical.  Chroma is encoded the same way from the 4:2:0
    subsampled planes.  Valid, deterministic, deliberately simple.
    """
    from tiledb_vector_search_spark.objects.vp8 import (
        B_PRED as BP,
        _inv_dct,
        _pred_b4,
    )
    from tiledb_vector_search_spark.objects.vp8_tables import (
        AC_QLOOKUP,
        DC_QLOOKUP,
    )

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
    yw, yh = mbw * 16, mbh * 16

    # RGB -> BT.601 limited-range YUV 4:2:0 (inverse of decode_vp8's
    # conversion), edge-padded to MB size
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    yf = 16.0 + 65.738 * r / 256 + 129.057 * g / 256 + 25.064 * b / 256
    uf = 128.0 - 37.945 * r / 256 - 74.494 * g / 256 + 112.439 * b / 256
    vf = 128.0 + 112.439 * r / 256 - 94.154 * g / 256 - 18.285 * b / 256
    Y = np.zeros((yh, yw))
    Y[:h, :w] = yf
    Y[h:, :w] = yf[-1:, :]
    Y[:, w:] = Y[:, w - 1 : w]
    # simple 2x2 average subsample on the padded plane
    Uf = np.zeros((yh, yw))
    Uf[:h, :w] = uf
    Uf[h:, :w] = uf[-1:, :]
    Uf[:, w:] = Uf[:, w - 1 : w]
    Vf = np.zeros((yh, yw))
    Vf[:h, :w] = vf
    Vf[h:, :w] = vf[-1:, :]
    Vf[:, w:] = Vf[:, w - 1 : w]
    U = (Uf[0::2, 0::2] + Uf[0::2, 1::2] + Uf[1::2, 0::2] + Uf[1::2, 1::2]) / 4
    V = (Vf[0::2, 0::2] + Vf[0::2, 1::2] + Vf[1::2, 0::2] + Vf[1::2, 1::2]) / 4

    # least-squares inverse of the decoder's IDCT, linearized at a large
    # probe amplitude (a unit probe vanishes in the >>16 fixed-point)
    M = np.zeros((16, 16))
    for k in range(16):
        e = [0] * 16
        e[k] = 1 << 12
        M[:, k] = _inv_dct(e).reshape(-1) / float(1 << 12)
    Minv = np.linalg.inv(M)

    qi = max(0, min(127, y_ac_qi))
    dq_y = (DC_QLOOKUP[qi], AC_QLOOKUP[qi])
    dq_uv = (min(DC_QLOOKUP[qi], 132), AC_QLOOKUP[qi])

    recon_y = np.zeros((yh, yw), dtype=np.uint8)
    recon_u = np.zeros((yh // 2, yw // 2), dtype=np.uint8)
    recon_v = np.zeros((yh // 2, yw // 2), dtype=np.uint8)
    y_blocks = {}
    uv_blocks = {}
    tr127 = np.full(4, 127, dtype=np.int64)

    def encode_plane(src, recon, dq, put):
        ph, pw = recon.shape
        for by in range(ph // 4):
            for bx in range(pw // 4):
                py, px = by * 4, bx * 4
                pred = _pred_b4(recon, px, py, 0, None, tr127, bx & 3, by & 3)
                res = src[py : py + 4, px : px + 4] - pred
                c = Minv @ res.reshape(-1)
                q = np.zeros(16, dtype=np.int64)
                q[0] = np.round(c[0] / dq[0])
                q[1:] = np.round(c[1:] / dq[1])
                q = np.clip(q, -2000, 2000)
                deq = [
                    int(q[k]) * (dq[0] if k == 0 else dq[1])
                    for k in range(16)
                ]
                out = pred + (
                    _inv_dct(deq) if any(deq) else 0
                )
                recon[py : py + 4, px : px + 4] = np.clip(out, 0, 255)
                put(by, bx, [int(x) for x in q])

    def put_y(by, bx, q):
        y_blocks[(by // 4, bx // 4, by % 4, bx % 4)] = q

    def put_u(by, bx, q):
        uv_blocks[("u", by // 2, bx // 2, by % 2, bx % 2)] = q

    def put_v(by, bx, q):
        uv_blocks[("v", by // 2, bx // 2, by % 2, bx % 2)] = q

    encode_plane(Y, recon_y, dq_y, put_y)
    encode_plane(U, recon_u, dq_uv, put_u)
    encode_plane(V, recon_v, dq_uv, put_v)

    # B_PRED with all-default (B_DC) modes; tr127 matches the decoder's
    # above-right for the probed modes only when there is no above MB —
    # B_DC never reads above-right, so the state stays in lock-step
    pay = encode_vp8_frame(
        width=w, height=h, y_ac_qi=qi, ymode=BP,
        y_blocks=y_blocks, uv_blocks=uv_blocks,
    )
    return wrap_webp(pay)
