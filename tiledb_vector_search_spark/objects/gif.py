"""Dependency-free GIF (87a / 89a) decoder + minimal encoder.

Reference parity: the reference decodes every image format through PIL
(``apis/python/src/tiledb/vector_search/object_readers/directory_reader.py``
— ``Image.open`` inside the directory reader); GIF is a format crawl
corpora actually contain, so this module implements the GIF subset
natively: LZW raster decompression (variable 3-12-bit codes, table
growth, deferred clear, the KwKwK case), global + local color tables,
interlaced rasters, and GIF89a animation — graphic-control disposal
methods 0-3, per-frame transparency, restore-to-previous — with the
same frame-sampling surface as the MJPEG / PNM stream decoders.

Decode safety: the logical-screen and per-frame descriptors are parsed
BEFORE any raster is decompressed, and the summed pixel budget is
checked against ``GIF_MAX_PIXELS``.  The LZW symbol loop is pure Python
(roughly 0.5-2 M px/s on noisy rasters), so the ceiling is a CPU-time
bound the way ``VP8_MAX_PIXELS`` / ``VP8L_MAX_PIXELS`` are, not just a
memory bound; blobs above it raise the PIL hint via
:func:`..codecs.decode_image`'s fallback chain.

Compositing contract (the modern-renderer one): the canvas starts fully
transparent; each frame's opaque pixels overwrite their region;
disposal 2 clears the frame region back to transparent (background
restore — browsers render the "background" as transparency, and so do
we); disposal 3 restores the region to its pre-frame pixels.  Returned
frames are the composited canvas with still-transparent pixels taking
the global-palette background color (black when there is none), giving
the ``(h, w, 3)`` uint8 contract every other decoder here uses.
"""

from __future__ import annotations

import struct

import numpy as np

# CPU-time guard: canvas pixels + Σ frame-raster pixels.  The pure-Python
# LZW loop makes this a wall-clock bound (like VP8_MAX_PIXELS), far below
# any memory limit.
GIF_MAX_PIXELS = 8_000_000

_MAX_CODE = 4096  # 12-bit LZW code space (spec-fixed)


# --- LZW ---------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> bytearray:
    """Decode a GIF LZW stream (sub-blocks already concatenated) to at
    most ``npix`` palette indices.

    Variable code width ``min_code_size+1`` … 12, LSB-first bit packing,
    clear / end-of-information codes, and the KwKwK (code == next free
    entry) case.  A truncated stream returns the indices decoded so far
    (giflib's tolerance); a code beyond the table raises.
    """
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes((c,)) for c in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    out = bytearray()
    acc = 0
    nbits = 0
    i = 0
    n = len(data)
    while len(out) < npix:
        while nbits < width:
            if i >= n:
                return out  # truncated stream: keep what decoded
            acc |= data[i] << nbits
            i += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < clear or (eoi < code < len(table)):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            # the NEXT code needs one more bit once the table fills the
            # current width's code space ("deferred clear": at 12 bits
            # the table stops growing and the encoder must send clear)
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encode: real dictionary compression (not the
    clear-code-per-symbol trick), emitting a conservative clear slightly
    before the table fills.  Pinned by the encode→decode roundtrip
    property sweep and the giflib DGifSlurp differential in
    ``tests/test_gif_codec.py``."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    d: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = -1
    for c in indices:
        if prev < 0:
            prev = c
            continue
        key = (prev, c)
        got = d.get(key)
        if got is not None:
            prev = got
            continue
        emit(prev, width)
        d[key] = next_code
        next_code += 1
        # the decoder registers this entry on READING the code above, so
        # its width bump lags ours by one emission: bump at 2^w + 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= _MAX_CODE - 1:  # conservative early clear
            emit(clear, width)
            d.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = c
    if prev >= 0:
        emit(prev, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- container parse ---------------------------------------------------------


def _sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate the data sub-blocks at ``pos``; returns (data, pos
    past the terminator)."""
    parts = []
    n = len(blob)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF (unterminated sub-blocks)")
        size = blob[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        parts.append(blob[pos : pos + size])
        pos += size


def _color_table(blob: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(blob):
        raise ValueError("truncated GIF color table")
    tbl = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3).copy()
    return tbl, end


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Reorder an interlaced raster's rows into display order."""
    h = idx.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _parse_gif(blob: bytes):
    """Structural parse: logical screen + per-frame descriptors, color
    tables, graphic-control state, and RAW (still-compressed) rasters.
    The pixel-budget bomb guard runs here — before any LZW work."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF blob")
    if len(blob) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, bg, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(blob, pos, 2 << (flags & 7))
    total_px = sw * sh
    if total_px > GIF_MAX_PIXELS:
        raise ValueError(
            f"GIF logical screen {sw}x{sh} exceeds GIF_MAX_PIXELS "
            f"({GIF_MAX_PIXELS}); refusing pure-Python decode"
        )
    frames = []
    gce = (0, -1, 0)  # (disposal, transparent index, delay)
    have_gce = False
    while True:
        if pos >= len(blob):
            raise ValueError("truncated GIF (missing trailer)")
        block = blob[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos + 2 > len(blob):
                raise ValueError("truncated GIF extension")
            label = blob[pos + 1]
            data, pos = _sub_blocks(blob, pos + 2)
            if label == 0xF9 and len(data) >= 4:
                packed, delay, trans = struct.unpack_from("<BHB", data)
                gce = (
                    (packed >> 2) & 7,
                    trans if packed & 1 else -1,
                    delay,
                )
                have_gce = True
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(blob):
                raise ValueError("truncated GIF image descriptor")
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", blob, pos + 1)
            pos += 10
            lct = None
            if iflags & 0x80:
                lct, pos = _color_table(blob, pos, 2 << (iflags & 7))
            if w == 0 or h == 0:
                raise ValueError("GIF frame with zero dimension")
            # a frame exceeding the logical screen is mis-authored but
            # tolerated by real decoders (PIL, browsers) by CLIPPING to
            # the screen — the compositor clips, parse stays permissive
            total_px += w * h
            if total_px > GIF_MAX_PIXELS:
                raise ValueError(
                    f"GIF pixel budget {total_px} exceeds GIF_MAX_PIXELS "
                    f"({GIF_MAX_PIXELS}); refusing pure-Python decode"
                )
            if pos >= len(blob):
                raise ValueError("truncated GIF raster")
            mcs = blob[pos]
            data, pos = _sub_blocks(blob, pos + 1)
            frames.append(
                {
                    "left": left,
                    "top": top,
                    "w": w,
                    "h": h,
                    "interlace": bool(iflags & 0x40),
                    "lct": lct,
                    "min_code_size": mcs,
                    "lzw": data,
                    "gce": gce if have_gce else (0, -1, 0),
                }
            )
            gce = (0, -1, 0)
            have_gce = False
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return sw, sh, bg, gct, frames


def _frame_indices(fr: dict) -> np.ndarray:
    """LZW-decode one frame's raster to a (h, w) palette-index array
    (truncated streams zero-pad, giflib-style), de-interlaced."""
    w, h = fr["w"], fr["h"]
    raw = _lzw_decode(fr["lzw"], fr["min_code_size"], w * h)
    if len(raw) < w * h:
        raw = raw + bytes(w * h - len(raw))
    idx = np.frombuffer(bytes(raw[: w * h]), np.uint8).reshape(h, w)
    if fr["interlace"]:
        idx = _deinterlace(idx)
    return idx


# --- decode ------------------------------------------------------------------


def decode_gif_frames(blob: bytes) -> list[np.ndarray]:
    """Decode EVERY frame of a (possibly animated) GIF, composited per
    the module-docstring contract, each ``(h, w, 3)`` uint8.

    Exactly :func:`sample_gif_frames` at ``every_n=1`` — ONE compositing
    loop (canvas, disposal 2/3, transparency, screen clip) for both
    surfaces, so a fix to one can't silently miss the other.
    """
    return sample_gif_frames(blob, every_n=1)


def decode_gif(blob: bytes) -> np.ndarray:
    """First composited frame of a GIF as ``(h, w, 3)`` uint8 — what a
    still-image consumer (embedding, pHash) wants from an animation."""
    sw, sh, bg, gct, frames = _parse_gif(blob)
    if not frames:
        raise ValueError("GIF contains no image")
    # decode only the first raster: a still GIF never pays animation cost
    frames = frames[:1]
    blob_first = (sw, sh, bg, gct, frames)
    return _composite_first(*blob_first)


def _composite_first(sw, sh, bg, gct, frames) -> np.ndarray:
    fr = frames[0]
    _disposal, trans, _delay = fr["gce"]
    pal = fr["lct"] if fr["lct"] is not None else gct
    if pal is None:
        raise ValueError("GIF frame has no color table")
    idx = _frame_indices(fr)
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("GIF pixel index beyond the color table")
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    region = canvas[
        fr["top"] : fr["top"] + fr["h"], fr["left"] : fr["left"] + fr["w"]
    ]
    if region.shape[:2] != (fr["h"], fr["w"]):
        # mis-authored frame exceeding the logical screen: clip the
        # raster to the on-screen part (PIL/browser behavior)
        idx = idx[: region.shape[0], : region.shape[1]]
    rgb = pal[idx]
    if trans >= 0:
        opaque = (idx != trans)[..., None]
        rgb = np.where(opaque, rgb, region)
    region[:] = rgb
    return canvas


def sample_gif_frames(blob: bytes, every_n: int = 1) -> list[np.ndarray]:
    """Every ``every_n``-th composited frame of an animated GIF — the
    frame-sampling surface ``sample_pnm_frames`` / ``sample_mjpeg_frames``
    expose.  Unlike those stream formats, GIF frames composite onto a
    shared canvas, so unsampled frames still LZW-decode (their pixels can
    show through later frames); only the composited COPIES are skipped —
    memory stays one canvas + the sampled outputs."""
    sw, sh, bg, gct, frames = _parse_gif(blob)
    if not frames:
        raise ValueError("GIF contains no image")
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.zeros((sh, sw, 4), np.uint8)
    out = []
    for i, fr in enumerate(frames):
        disposal, trans, _delay = fr["gce"]
        pal = fr["lct"] if fr["lct"] is not None else gct
        if pal is None:
            raise ValueError("GIF frame has no color table")
        idx = _frame_indices(fr)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF pixel index beyond the color table")
        t, l, h, w = fr["top"], fr["left"], fr["h"], fr["w"]
        region = canvas[t : t + h, l : l + w]
        if region.shape[:2] != (h, w):
            # mis-authored frame exceeding the logical screen: clip the
            # raster to the on-screen part (PIL/browser behavior)
            idx = idx[: region.shape[0], : region.shape[1]]
        saved = region.copy() if disposal == 3 else None
        opaque = idx != trans if trans >= 0 else np.ones_like(idx, bool)
        region[opaque, :3] = pal[idx[opaque]]
        region[opaque, 3] = 255
        if i % every_n == 0:
            alpha = canvas[..., 3:] == 255
            out.append(
                np.where(alpha, canvas[..., :3], bg_rgb).astype(np.uint8)
            )
        if disposal == 2:
            region[:] = 0
        elif disposal == 3:
            region[:] = saved
    return out


# --- encode ------------------------------------------------------------------


def _build_palette(frames, transparent_color, background):
    """Global palette over every frame's colors (+ the reserved
    transparent / background colors, if any).  Raises beyond 256 — this
    encoder is a fixture builder, not a quantizer."""
    colors = [np.asarray(f, np.uint8).reshape(-1, 3) for f in frames]
    for extra in (transparent_color, background):
        if extra is not None:
            colors.append(np.asarray(extra, np.uint8).reshape(1, 3))
    uniq = np.unique(np.concatenate(colors), axis=0)
    if len(uniq) > 256:
        raise ValueError(
            f"encode_gif needs <=256 distinct colors, got {len(uniq)}"
        )
    return uniq


def _interlace_rows(h: int) -> np.ndarray:
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )


def encode_gif(
    frames,
    *,
    screen_size=None,
    offsets=None,
    delays=None,
    disposals=None,
    transparent_color=None,
    interlace: bool = False,
    background=None,
    loop: int = 0,
) -> bytes:
    """Minimal GIF89a encoder for fixtures and lossless re-encodes.

    ``frames`` — list of ``(h, w, 3)`` uint8 arrays (one → still GIF).
    ``offsets`` — per-frame (top, left) placement on the logical screen
    (frames may be partial — the animation-compositing test surface).
    ``transparent_color`` — an RGB triple; pixels equal to it encode as
    the transparent index.  ``disposals`` — per-frame disposal method.
    Real LZW compression (table growth + conservative clear), optional
    interlaced rasters.  Lossless by construction for any input within
    the 256-color budget; pinned by the roundtrip sweep and the giflib
    differential."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    if any(f.ndim != 3 or f.shape[2] != 3 for f in frames):
        raise ValueError("encode_gif wants (h, w, 3) uint8 frames")
    offsets = offsets or [(0, 0)] * len(frames)
    if screen_size is None:
        sh = max(t + f.shape[0] for (t, _l), f in zip(offsets, frames))
        sw = max(l + f.shape[1] for (_t, l), f in zip(offsets, frames))
    else:
        sh, sw = screen_size
    pal = _build_palette(frames, transparent_color, background)
    npal = max(2, len(pal))
    gct_bits = max(1, (npal - 1).bit_length())
    gct_n = 1 << gct_bits
    trans_idx = -1
    if transparent_color is not None:
        tc = np.asarray(transparent_color, np.uint8)
        trans_idx = int(np.where((pal == tc).all(axis=1))[0][0])
    bg_idx = 0
    if background is not None:
        bgc = np.asarray(background, np.uint8)
        hit = np.where((pal == bgc).all(axis=1))[0]
        if len(hit) == 0:
            raise AssertionError("unreachable: background is folded into the palette")
        bg_idx = int(hit[0])

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | ((gct_bits - 1) & 7), bg_idx, 0)
    gct = np.zeros((gct_n, 3), np.uint8)
    gct[: len(pal)] = pal
    out += gct.tobytes()
    animated = len(frames) > 1
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    delays = delays or [10] * len(frames)
    disposals = disposals or [0] * len(frames)
    # palette-index lookup: pack RGB to a single int key
    keys = (
        pal[:, 0].astype(np.int64) << 16
        | pal[:, 1].astype(np.int64) << 8
        | pal[:, 2].astype(np.int64)
    )
    lut = dict(zip(keys.tolist(), range(len(pal))))
    for f, (top, left), delay, disposal in zip(frames, offsets, delays, disposals):
        if trans_idx >= 0 or animated or disposal:
            packed = (disposal & 7) << 2 | (1 if trans_idx >= 0 else 0)
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", packed, delay, max(trans_idx, 0)
            ) + b"\x00"
        h, w = f.shape[:2]
        iflags = (0x40 if interlace else 0)
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, iflags)
        fk = (
            f[..., 0].astype(np.int64) << 16
            | f[..., 1].astype(np.int64) << 8
            | f[..., 2].astype(np.int64)
        )
        idx = np.vectorize(lut.__getitem__, otypes=[np.uint8])(fk)
        if interlace:
            idx = idx[_interlace_rows(h)]
        mcs = max(2, gct_bits)
        out.append(mcs)
        lzw = _lzw_encode(idx.tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
