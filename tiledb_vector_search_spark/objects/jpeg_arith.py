"""JPEG arithmetic entropy decoding (ITU-T T.81 Annexes D, F.2.4, G.2).

Covers the arithmetic twins of the already-native Huffman processes:
extended sequential (SOF9) and progressive (SOF10) scans, with DAC
conditioning, restart intervals (decoder re-init + statistics reset),
and the fixed equiprobable bin.  The reference decodes these via PIL
(``object_readers/directory_reader.py:507-643``); after this module the
only JPEG tail left is 12-bit precision.

The QM-coder state machine (Qe / NMPS / NLPS / SWITCH) lives in the
generated :mod:`jpeg_arith_table` — extracted from the system libjpeg's
exported read-only table the way the VP8 probability tables were
extracted from libwebp, because hand-transcribing 113 hex rows would be
silently wrong.  The decoder itself follows the published T.81
flowcharts: INITDEC (F.25), DECODE (F.26), MPS/LPS_EXCHANGE (F.27/28),
RENORMD (F.29), BYTEIN (F.30 — 0xFF00 unstuffing; a marker feeds zero
bytes from then on), and the DC/AC decision trees of F.2.4.1-F.2.4.2
plus their progressive variants in G.2.  Correctness is pinned by a
differential in ``tests/test_jpeg_arith.py``: the SAME pixels encoded
by the system libjpeg with Huffman and with arithmetic entropy at
identical quantization MUST decode byte-identically through this
package (the entropy layer is lossless, and the Huffman path is already
pinned independently).
"""

from __future__ import annotations

import numpy as np

from tiledb_vector_search_spark.objects.jpeg_arith_table import ARITH_TAB

_FIXED_BIN = 113  # the equiprobable, never-adapting state

DC_STAT_BINS = 64
AC_STAT_BINS = 256


class ArithDecoder:
    """T.81 Annex F.2.8 arithmetic decoder over one entropy-coded
    segment.  Consumes bytes with 0xFF00 unstuffing; the first marker
    ends the segment (zero bytes feed from then on, per F.2.2.2), and
    ``self.marker_at`` records its position for the scan driver."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.marker_at: int | None = None
        # INITDEC with the full-interval convention libjpeg uses: the
        # interval register starts at 0x10000 (NOT 0x8000 — this is a
        # 17-bit A; renormalization keeps it in [0x8000, 0x10000]
        # thereafter) and the 16-bit code window C_high holds the first
        # two data bytes exactly: C = B0<<24 | B1<<16, zero pending
        # bits.  An 0x8000/15-bit-window INITDEC (the MQ-coder form of
        # T.88/JPEG 2000) decodes garbage: it halves every code value
        # AND activates the conditional exchange on the first decision.
        self.c = self._byte() << 16
        self._bytein()
        self.c = (self.c << 8) & 0xFFFFFFFF
        self.ct -= 8
        self.a = 0x10000

    def _byte(self) -> int:
        buf, n = self.buf, len(self.buf)
        if self.marker_at is not None:
            return 0
        p = self.pos
        if p >= n:
            self.marker_at = n
            return 0
        b = buf[p]
        if b == 0xFF:
            q = p + 1
            while q < n and buf[q] == 0xFF:  # fill bytes before a marker
                q += 1
            if q < n and buf[q] == 0x00:  # stuffed data byte
                self.pos = q + 1
                return 0xFF
            self.marker_at = p  # real marker (or truncation)
            return 0
        self.pos = p + 1
        return b

    def _bytein(self) -> None:
        self.c += self._byte() << 8
        self.ct = 8

    def decode(self, stats, idx: int) -> int:
        """One binary decision from statistics bin ``stats[idx]`` (bit 7
        = MPS sense, bits 0-6 = state index).  ``stats is None`` decodes
        the fixed equiprobable bin: state 113, whose NMPS/NLPS both point
        back at 113, so it never adapts and needs no writeback.

        Hot path (one call per decision, several per coefficient): the
        interval/code registers are worked in locals and RENORMD is
        inlined — the statistics areas are ``bytearray`` so the state
        load/writeback is a plain int, not a numpy scalar."""
        sv = stats[idx] if stats is not None else _FIXED_BIN
        qe, nmps, nlps, switch = ARITH_TAB[sv & 0x7F]
        mps = sv >> 7

        # T.81 interval convention: MPS occupies [0, A−Qe) at the
        # bottom, LPS [A−Qe, A) at the top
        a = self.a - qe
        c = self.c
        if (c >> 16) >= a:
            # LPS subinterval: subtract the MPS base, then the
            # conditional exchange of F.28
            c -= a << 16
            if a < qe:
                d = mps
                new = (sv & 0x80) | nmps
            else:
                d = mps ^ 1
                if switch:
                    mps ^= 1
                new = (mps << 7) | nlps
            a = qe
        elif a & 0x8000:
            self.a = a
            return mps
        else:
            # MPS path needing renormalization (conditional exchange,
            # F.27)
            if a < qe:
                d = mps ^ 1
                if switch:
                    mps ^= 1
                new = (mps << 7) | nlps
            else:
                d = mps
                new = (sv & 0x80) | nmps
        if stats is not None:
            stats[idx] = new
        ct = self.ct
        while True:  # RENORMD (F.29) inlined
            if ct == 0:
                c += self._byte() << 8
                ct = 8
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct
        return d

    def decode_fixed(self) -> int:
        return self.decode(None, _FIXED_BIN)


class ArithConditioning:
    """DAC-marker state: DC (L, U) thresholds and AC Kx per table id,
    with the T.81 defaults (L=0, U=1, Kx=5)."""

    def __init__(self):
        self.dc_l = [0] * 16
        self.dc_u = [1] * 16
        self.ac_k = [5] * 16

    def parse_dac(self, data: bytes) -> None:
        i = 0
        while i + 1 < len(data):
            tc, tb = data[i] >> 4, data[i] & 0x0F
            cs = data[i + 1]
            i += 2
            if tb > 15:
                raise ValueError("bad DAC table id")
            if tc == 0:
                lo, hi = cs & 0x0F, cs >> 4
                if lo > hi:
                    raise ValueError("DAC DC conditioning L > U")
                self.dc_l[tb] = lo
                self.dc_u[tb] = hi
            elif tc == 1:
                if not 1 <= cs <= 63:
                    raise ValueError("DAC AC conditioning Kx out of range")
                self.ac_k[tb] = cs
            else:
                raise ValueError("bad DAC table class")


class _ScanState:
    """Per-scan statistics areas + DC predictions (reset at restarts)."""

    def __init__(self, ncomp: int):
        self.dc_stats: dict[int, bytearray] = {}
        self.ac_stats: dict[int, bytearray] = {}
        self.dc_context = [0] * ncomp
        self.last_dc = [0] * ncomp

    def dc(self, tbl: int) -> bytearray:
        if tbl not in self.dc_stats:
            self.dc_stats[tbl] = bytearray(DC_STAT_BINS)
        return self.dc_stats[tbl]

    def ac(self, tbl: int) -> bytearray:
        if tbl not in self.ac_stats:
            self.ac_stats[tbl] = bytearray(AC_STAT_BINS)
        return self.ac_stats[tbl]

    def reset(self) -> None:
        for v in self.dc_stats.values():
            v[:] = bytes(len(v))
        for v in self.ac_stats.values():
            v[:] = bytes(len(v))
        self.dc_context = [0] * len(self.dc_context)
        self.last_dc = [0] * len(self.last_dc)


def _decode_dc_diff(dec, st, state, ci, cond, tbl) -> int:
    """T.81 F.2.4.1: decode one DC difference and update the per-
    component conditioning context classification (F.1.4.4.1.2)."""
    s0 = state.dc_context[ci]
    if dec.decode(st, s0) == 0:
        state.dc_context[ci] = 0
        return 0
    sign = dec.decode(st, s0 + 1)
    m = dec.decode(st, s0 + 2 + sign)
    if m != 0:
        idx = 20  # X1
        while dec.decode(st, idx):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG DC magnitude overflow")
            idx += 1
    else:
        idx = s0 + 2 + sign
    if m < (1 << cond.dc_l[tbl]) >> 1:
        state.dc_context[ci] = 0
    elif m > (1 << cond.dc_u[tbl]) >> 1:
        state.dc_context[ci] = 12 + sign * 4
    else:
        state.dc_context[ci] = 4 + sign * 4
    v = m
    idx += 14  # magnitude-bit bins follow the category bins
    mm = m >> 1
    while mm:
        if dec.decode(st, idx):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def _decode_ac_coef(dec, st, k, kx) -> int:
    """T.81 F.2.4.2 body after the EOB/zero decisions: sign, magnitude
    category, magnitude bits for the nonzero coefficient at index k."""
    base = 3 * (k - 1)
    sign = dec.decode_fixed()
    idx = base + 2
    m = dec.decode(st, idx)
    if m != 0 and dec.decode(st, idx):
        m = 2
        idx = 189 if k <= kx else 217
        while dec.decode(st, idx):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG AC magnitude overflow")
            idx += 1
    v = m
    idx += 14
    mm = m >> 1
    while mm:
        if dec.decode(st, idx):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def decode_block_sequential(dec, state, cond, ci, td, ta, coef) -> None:
    """One 8×8 block's zigzag coefficients (sequential, Ss=0..Se=63)."""
    st = state.dc(td)
    state.last_dc[ci] += _decode_dc_diff(dec, st, state, ci, cond, td)
    coef[0] = state.last_dc[ci]
    st = state.ac(ta)
    kx = cond.ac_k[ta]
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            break
        while dec.decode(st, base + 1) == 0:
            k += 1
            base += 3
            if k > 63:
                raise ValueError("arithmetic JPEG AC index overflow")
        coef[k] = _decode_ac_coef(dec, st, k, kx)
        k += 1


def decode_block_dc_first(dec, state, cond, ci, td, al, blk) -> None:
    st = state.dc(td)
    state.last_dc[ci] += _decode_dc_diff(dec, st, state, ci, cond, td)
    blk[0] = state.last_dc[ci] << al


def decode_block_dc_refine(dec, al, blk) -> None:
    if dec.decode_fixed():
        blk[0] |= 1 << al


def decode_block_ac_first(dec, state, cond, ta, ss, se, al, blk) -> None:
    st = state.ac(ta)
    kx = cond.ac_k[ta]
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            return
        while dec.decode(st, base + 1) == 0:
            k += 1
            base += 3
            if k > se:
                raise ValueError("arithmetic JPEG AC index overflow")
        blk[k] = _decode_ac_coef(dec, st, k, kx) << al
        k += 1


def decode_block_ac_refine(dec, state, ta, ss, se, al, blk) -> None:
    """T.81 G.2.2 AC successive-approximation refinement: beyond the
    previous scan's end-of-block (kex) an EOB decision gates each index;
    within it, nonzero-history coefficients take a correction bit and
    zero-history ones a newly-nonzero decision."""
    st = state.ac(ta)
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex > 0 and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st, base):  # EOB
            return
        while True:
            if blk[k] != 0:
                if dec.decode(st, base + 2):
                    blk[k] += m1 if blk[k] < 0 else p1
                break
            if dec.decode(st, base + 1):
                blk[k] = m1 if dec.decode_fixed() else p1
                break
            k += 1
            base += 3
            if k > se:
                raise ValueError("arithmetic JPEG AC index overflow")
        k += 1


def resync_restart(buf: bytes, dec: ArithDecoder) -> ArithDecoder:
    """Cross an RSTn boundary: locate the marker the decoder stopped at
    (or scan forward to it), verify it is a restart, and return a fresh
    decoder starting after it.  Statistics/context resets are the
    caller's job (they live in _ScanState)."""
    p = dec.marker_at if dec.marker_at is not None else dec.pos
    n = len(buf)
    while p + 1 < n and not (buf[p] == 0xFF and buf[p + 1] != 0x00):
        p += 1
    if p + 1 >= n:
        raise ValueError("truncated JPEG: missing restart marker")
    while p + 1 < n and buf[p + 1] == 0xFF:  # fill bytes
        p += 1
    if not 0xD0 <= buf[p + 1] <= 0xD7:
        raise ValueError(f"expected RSTn, found 0xFF{buf[p + 1]:02X}")
    return ArithDecoder(buf, p + 2)


def scan_end(buf: bytes, dec: ArithDecoder) -> int:
    """Byte offset of the next real marker after the scan — delegates
    to the ONE resync scanner shared with the Huffman backend."""
    from tiledb_vector_search_spark.objects.jpeg import _marker_resync

    return _marker_resync(
        buf, dec.marker_at if dec.marker_at is not None else dec.pos
    )


def decode_scan_arith(buf, pos, frame, sel, qt, cond, restart, planes):
    """Decode ONE sequential arithmetic scan (SOF9) into ``planes``;
    returns the offset of the next marker.  Mirrors the Huffman
    ``_decode_scan`` geometry EXACTLY: an Ns>1 scan interleaves the
    SCAN's components over the frame MCU grid; an Ns=1 scan is
    NON-interleaved (a raster over the component's own ceil-divided
    block grid) — the first cut iterated ALL frame components per MCU,
    crashing multi-scan files with KeyError and silently desyncing on
    single-component frames with subsampled declarations.  Restart:
    fresh decoder + statistics/context reset."""
    from tiledb_vector_search_spark.objects.jpeg import (
        _ZIGZAG,
        _idct2,
    )

    h, w, comps, prec = frame
    mid = float(1 << (prec - 1))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    comp_idx = {cid: i for i, (cid, _ch, _cv, _tq) in enumerate(comps)}
    try:
        scan_cis = [comp_idx[cs] for cs in sel]
        q_of = {ci: qt[comps[ci][3]] for ci in scan_cis}
    except KeyError as exc:
        # corrupt-blob taxonomy: callers isolate bad blobs with
        # 'except ValueError' — a raw KeyError here failed whole tasks
        raise ValueError(
            f"JPEG scan references unknown component/table {exc.args[0]}"
        ) from None
    state = _ScanState(len(comps))
    dec = ArithDecoder(buf, pos)
    coef = np.zeros(64, dtype=np.int64)

    def decode_block_into(ci, by, bx):
        cid = comps[ci][0]
        td, ta = sel[cid]
        coef[:] = 0
        decode_block_sequential(dec, state, cond, ci, td, ta, coef)
        block = np.zeros(64, dtype=np.float64)
        block[_ZIGZAG] = coef * q_of[ci]
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
                    dec = resync_restart(buf, dec)
                    state.reset()
                decode_block_into(ci, by, bx)
                count += 1
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and count and count % restart == 0:
                    dec = resync_restart(buf, dec)
                    state.reset()
                for ci in scan_cis:
                    _cid, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            decode_block_into(ci, my * cv + by, mx * ch + bx)
                count += 1
    return scan_end(buf, dec)


def decode_progressive_scan_arith(
    buf, pos, frame, sel_list, cond, restart, ss, se, ah, al, coefs
):
    """One progressive arithmetic scan (SOF10, T.81 G.2): mutate the
    per-component zigzag coefficient grids; return the offset of the
    next marker.  Same scan-geometry rules as the Huffman progressive
    driver (interleaved DC-only MCU order vs single-component block
    raster)."""
    h, w, comps, _prec = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_idx = {c[0]: i for i, c in enumerate(comps)}
    for cs, _t in sel_list:
        if cs not in comp_idx:
            raise ValueError(
                f"JPEG scan references unknown component {cs}"
            )
    if ss == 0 and se != 0:
        raise ValueError("invalid progressive scan header (Ss=0, Se!=0)")
    if ss > se or se > 63:
        raise ValueError("invalid progressive spectral selection")
    state = _ScanState(len(comps))
    dec = ArithDecoder(buf, pos)

    def unit(blk, ci, td, ta):
        if ss == 0:
            if ah == 0:
                decode_block_dc_first(dec, state, cond, ci, td, al, blk)
            else:
                decode_block_dc_refine(dec, al, blk)
        else:
            if ah == 0:
                decode_block_ac_first(dec, state, cond, ta, ss, se, al, blk)
            else:
                decode_block_ac_refine(dec, state, ta, ss, se, al, blk)

    if len(sel_list) > 1:  # interleaved (DC-only scans)
        if ss != 0:
            raise ValueError("interleaved progressive AC scan is invalid")
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and count and count % restart == 0:
                    dec = resync_restart(buf, dec)
                    state.reset()
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
    else:
        (cs, (td, ta)), = sel_list
        ci = comp_idx[cs]
        _cid, ch, cv, _tq = comps[ci]
        bw_c = -(-(-(-w * ch // hmax)) // 8)
        bh_c = -(-(-(-h * cv // vmax)) // 8)
        count = 0
        for by in range(bh_c):
            for bx in range(bw_c):
                if restart and count and count % restart == 0:
                    dec = resync_restart(buf, dec)
                    state.reset()
                unit(coefs[ci][by, bx], ci, td, ta)
                count += 1
    return scan_end(buf, dec)
