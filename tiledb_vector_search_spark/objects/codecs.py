"""Dependency-free image/stream codecs for the multimodal pipeline.

Real decoders for the binary netpbm family (PGM ``P5`` grayscale, PPM
``P6`` RGB) and for concatenated-PNM streams — the format ffmpeg emits for
``-f image2pipe -vcodec pnm`` raw video.  Pure numpy, so the multimodal
path has a genuinely working decode stage in this environment (the PIL /
opencv paths in :mod:`tiledb_vector_search_spark.objects.readers` remain
import-try optional).

Reference analogue: ``DirectoryImageReader`` decode
(``object_readers/directory_reader.py:507-643``) and the frame-sampling
video readers; here decode is a byte-layout parser instead of a codec
library call.

Decode-rate ledger (pure-Python paths, single core, this sandbox) for
sizing clusters: JPEG-Huffman ~0.90 MP/s, GIF ~1.6 MP/s, VP8L
(lossless WebP) ~0.38 MP/s, VP8 (lossy WebP) ~0.35 MP/s,
arithmetic-coded JPEG ~0.26 MP/s; PNG/netpbm are zlib/memcpy-bound and
far faster.  A deployment with Pillow should set
``SPARK_GRAFT_IMAGE_DECODER=system`` (or pass
``decode_image(..., prefer="system")``): the C path decodes mainstream
formats 30–100× faster, with these native decoders as the no-deps
fallback and the differential ground truth.
"""

from __future__ import annotations

import re

import numpy as np

_MAGIC_CHANNELS = {b"P5": 1, b"P6": 3}

# PNM header: magic, then 2 (P5/P6) sizes + maxval, each separated by
# whitespace/comments; '#' comments run to end of line
_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*([0-9]+)")


def area_mean_grid(x: np.ndarray, n: int) -> np.ndarray:
    """(n, n) area-mean downsample of a 2-D plane via one integral
    image — the shared resize behind the pHash kernel and the LumaGrid
    embedding (handles any h, w >= 1).  Bucket edges:
    ``lo = int(edge[r]); hi = min(max(ceil(edge[r+1]), lo+1), size)``.
    For integer-valued planes the float64 sums are exact, so callers'
    outputs are bit-deterministic."""
    h, w = x.shape
    ye = np.linspace(0, h, n + 1)
    xe = np.linspace(0, w, n + 1)
    y0 = ye[:-1].astype(np.int64)
    y1 = np.minimum(np.maximum(np.ceil(ye[1:]).astype(np.int64), y0 + 1), h)
    x0 = xe[:-1].astype(np.int64)
    x1 = np.minimum(np.maximum(np.ceil(xe[1:]).astype(np.int64), x0 + 1), w)
    s = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(x, axis=0), axis=1, out=s[1:, 1:])
    sums = (
        s[np.ix_(y1, x1)]
        - s[np.ix_(y0, x1)]
        - s[np.ix_(y1, x0)]
        + s[np.ix_(y0, x0)]
    )
    counts = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / counts


def _parse_header(buf: bytes, pos: int) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) for the PNM at ``pos``."""
    magic = buf[pos : pos + 2]
    if magic not in _MAGIC_CHANNELS:
        raise ValueError(f"not a binary PNM (magic {magic!r} at offset {pos})")
    cur = pos + 2
    vals = []
    for _ in range(3):
        m = _TOKEN.match(buf, cur)
        if not m:
            raise ValueError("truncated PNM header")
        vals.append(int(m.group(1)))
        cur = m.end()
    # exactly one whitespace byte separates maxval from pixel data
    if cur >= len(buf) or buf[cur : cur + 1] not in (b"\n", b" ", b"\t", b"\r"):
        raise ValueError("malformed PNM header terminator")
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    return magic, width, height, maxval, cur + 1


def decode_pnm(blob: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """Decode ONE binary PNM image starting at ``pos``.

    Returns ``(pixels, next_pos)`` — pixels shaped (h, w) for P5 or
    (h, w, 3) for P6 — so concatenated streams decode by iterating.
    """
    magic, w, h, _maxval, data = _parse_header(blob, pos)
    ch = _MAGIC_CHANNELS[magic]
    n = w * h * ch
    if data + n > len(blob):
        raise ValueError("truncated PNM pixel data")
    px = np.frombuffer(blob, dtype=np.uint8, count=n, offset=data)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return px.reshape(shape), data + n


def encode_pnm(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, 3) uint8 array as binary PGM/PPM."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        magic = b"P5"
        h, w = px.shape
    elif px.ndim == 3 and px.shape[2] == 3:
        magic = b"P6"
        h, w = px.shape[:2]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {px.shape}")
    return magic + b"\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_pnm_stream(blob: bytes) -> list[np.ndarray]:
    """Split a concatenated-PNM stream (ffmpeg image2pipe) into frames."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(blob):
        frame, pos = decode_pnm(blob, pos)
        frames.append(frame)
    return frames


def sample_pnm_frames(blob: bytes, every_n: int = 1) -> list[np.ndarray]:
    """Every ``every_n``-th frame of a PNM stream (frame-sampling contract:
    decode headers to SKIP pixel payloads of unsampled frames — the stream
    is never fully materialized as arrays)."""
    frames: list[np.ndarray] = []
    pos = 0
    i = 0
    while pos < len(blob):
        if i % every_n == 0:
            frame, pos = decode_pnm(blob, pos)
            frames.append(frame)
        else:
            # header-only parse: skip the pixel payload without decoding
            magic, w, h, _mx, data = _parse_header(blob, pos)
            pos = data + w * h * _MAGIC_CHANNELS[magic]
        i += 1
    return frames


# --- WAV / PCM audio ---------------------------------------------------------

_WAV_FMT_PCM = 1


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV blob → ((n_samples, channels) float64 in [-1, 1],
    sample_rate).

    Pure-struct RIFF parser (8/16/32-bit integer PCM) — the audio leg of
    the multimodal decode path, real like the netpbm image/stream codecs
    (compressed codecs need external libs and raise).
    """
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = pos + 8
        if body + size > len(blob):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("malformed WAV fmt chunk")
            (audio_fmt, channels, rate, _br, _ba, bits) = struct.unpack_from(
                "<HHIIHH", blob, body
            )
            if audio_fmt != _WAV_FMT_PCM:
                raise ValueError(f"only PCM WAV supported (fmt={audio_fmt})")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            channels, rate, bits = fmt
            if bits == 8:  # unsigned
                x = np.frombuffer(blob, np.uint8, size, body).astype(np.float64)
                x = (x - 128.0) / 128.0
            elif bits == 16:
                x = np.frombuffer(blob, "<i2", size // 2, body).astype(np.float64)
                x /= 32768.0
            elif bits == 32:
                x = np.frombuffer(blob, "<i4", size // 4, body).astype(np.float64)
                x /= 2147483648.0
            else:
                raise ValueError(f"unsupported PCM width {bits}")
            n = (len(x) // channels) * channels
            return x[:n].reshape(-1, channels), rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no WAV data chunk")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) float64 in [-1, 1] → 16-bit PCM WAV bytes."""
    import struct

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    channels = x.shape[1]
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16,
        _WAV_FMT_PCM, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def wav_features(blob: bytes) -> dict:
    """Deterministic audio features: duration, rms, zero-crossing rate —
    the audio feature-extract stage over an opaque binary column."""
    x, rate = decode_wav(blob)
    mono = x.mean(axis=1)
    n = len(mono)
    zc = int(np.sum(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0
    return {
        "sample_rate": int(rate),
        "n_samples": int(n),
        "channels": int(x.shape[1]),
        "duration_sec": float(n / rate) if rate else 0.0,
        "rms": float(np.sqrt(np.mean(mono * mono))) if n else 0.0,
        "zero_crossing_rate": float(zc / (n - 1)) if n > 1 else 0.0,
    }


def extract_audio_features(df, blob_col: str = "audio", id_col: str = "external_id"):
    """(id, sample_rate, n_samples, channels, duration_sec, rms,
    zero_crossing_rate) for a DataFrame with a WAV binary column — the
    audio feature-extract stage as an Arrow-batched ``mapInPandas``."""
    import pandas as pd

    schema = (
        f"{id_col} long, sample_rate int, n_samples int, channels int, "
        "duration_sec double, rms double, zero_crossing_rate double"
    )

    nulls = {
        "sample_rate": None, "n_samples": None, "channels": None,
        "duration_sec": None, "rms": None, "zero_crossing_rate": None,
    }

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for eid, blob in zip(pdf[id_col], pdf[blob_col]):
                # per-blob isolation: one corrupt/truncated WAV in a
                # crawled batch must not fail the whole task (the
                # phash64/audio_fingerprint NULL-on-bad-blob posture) —
                # retries replay a deterministic failure forever
                try:
                    feats = wav_features(bytes(blob)) if blob is not None \
                        else dict(nulls)
                except ValueError:
                    feats = dict(nulls)
                rows.append({id_col: int(eid), **feats})
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)
# --- PNG (pure stdlib: zlib + struct) ----------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# decompression-bomb guard: reject before inflating anything.  Header
# dimensions are UNTRUSTED 32-bit values from crawled bytes; a few-KB
# blob can claim a multi-GB canvas.  Same default ceiling as PIL's
# MAX_IMAGE_PIXELS; module-level so deployments can raise it.
PNG_MAX_PIXELS = 178_956_970


# Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw, offset, pw, ph, channels, depth):
    """Unfilter one (sub-)image's scanlines → ((ph, stride) uint8 bytes,
    bytes consumed).  Filters operate on BYTES with the spec's bpp
    (≥1 even for sub-byte depths)."""
    stride = (pw * channels * depth + 7) // 8
    bpp = max(1, channels * depth // 8)
    out = np.empty((ph, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(ph):
        base = offset + r * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub — per-lane cumsum (mod-256 add is associative)
            if stride % bpp == 0:
                cur = (
                    np.cumsum(
                        line.reshape(-1, bpp), axis=0, dtype=np.int64
                    ) & 0xFF
                ).reshape(stride).astype(np.int32)
            else:
                cur = line.copy()
                for i in range(bpp, stride):
                    cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = out[r]
    return out, ph * (stride + 1)


def _png_unpack(rows, pw, channels, depth, scale):
    """(ph, stride) unfiltered bytes → (ph, pw, channels) uint8 samples.
    16-bit samples keep the high byte (big-endian); sub-byte samples
    unpack MSB-first and scale to 0-255 when ``scale`` (gray) — palette
    indices stay raw."""
    ph = rows.shape[0]
    if depth == 8:
        return rows[:, : pw * channels].reshape(ph, pw, channels)
    if depth == 16:
        return rows[:, : pw * channels * 2].reshape(ph, pw, channels, 2)[
            :, :, :, 0
        ]
    # depth 1/2/4, single channel (gray or palette per spec)
    per_byte = 8 // depth
    bits = np.unpackbits(rows, axis=1)
    vals = np.zeros((ph, rows.shape[1] * per_byte), dtype=np.uint8)
    for b in range(depth):
        vals = (vals << 1) | bits[:, b :: depth][:, : vals.shape[1]]
    vals = vals[:, :pw]
    if scale and depth < 8:
        vals = (vals.astype(np.uint32) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
    return vals.reshape(ph, pw, 1)


def decode_png(blob: bytes) -> np.ndarray:
    """Decode a PNG → (h, w) grayscale or (h, w, 3|4) uint8 array.

    Dependency-free (stdlib ``zlib``): color types 0 (gray), 2 (RGB),
    3 (palette), 4 (gray+alpha), 6 (RGBA); bit depths 1/2/4/8/16
    (16-bit keeps the high byte — the PIL ``convert`` behavior);
    Adam7 interlace; all five scanline filters; multi-IDAT streams.
    """
    import struct
    import zlib

    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG blob")
    pos = 8
    ihdr = None
    palette = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        length, ctype = struct.unpack_from(">I4s", blob, pos)
        body = pos + 8
        if body + length > len(blob):
            raise ValueError("truncated PNG chunk")
        data = blob[body : body + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"bad PNG bit depth {depth}")
            if depth < 8 and color not in (0, 3):
                raise ValueError("sub-byte depth only for gray/palette")
            if depth == 16 and color == 3:
                raise ValueError("16-bit palette PNG is invalid")
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace {interlace}")
            if comp != 0 or filt != 0:
                raise ValueError("non-standard PNG compression/filter")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension PNG")
            if w * h > PNG_MAX_PIXELS:
                raise ValueError(
                    f"PNG dimensions {w}x{h} exceed PNG_MAX_PIXELS="
                    f"{PNG_MAX_PIXELS} (decompression-bomb guard)"
                )
            ihdr = (w, h, color, depth, interlace)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos = body + length + 4  # skip CRC
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, color, depth, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color}")

    if interlace:
        passes = []
        for x0, y0, xs, ys in _ADAM7:
            pw = max(0, -(-(w - x0) // xs))
            ph = max(0, -(-(h - y0) // ys))
            passes.append((x0, y0, xs, ys, pw, ph))
    else:
        passes = [(0, 0, 1, 1, w, h)]
    expected = sum(
        ph * (1 + (pw * channels * depth + 7) // 8)
        for *_, pw, ph in passes
        if pw and ph
    )
    # bounded inflate: never materialize more than the header-implied
    # size + 1 probe byte, even if the stream holds more
    dobj = zlib.decompressobj()
    raw = dobj.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("PNG pixel data size mismatch")

    px = np.zeros((h, w, channels), dtype=np.uint8)
    offset = 0
    for x0, y0, xs, ys, pw, ph in passes:
        if pw == 0 or ph == 0:
            continue
        rows, used = _png_unfilter(raw, offset, pw, ph, channels, depth)
        offset += used
        px[y0::ys, x0::xs] = _png_unpack(rows, pw, channels, depth, color == 0)
    if color == 3:  # palette → RGB (or RGBA with tRNS)
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        if palette.shape[0] and int(idx.max(initial=0)) >= palette.shape[0]:
            # corrupt blob, not a programming error: keep the module's
            # ValueError taxonomy (callers isolate bad blobs with
            # 'except ValueError'; a bare numpy IndexError crashed them)
            raise ValueError(
                "PNG palette index out of range "
                f"({int(idx.max())} >= {palette.shape[0]} PLTE entries)"
            )
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full((h, w, 1), 255, dtype=np.uint8)
            idx = px[:, :, 0]
            mask = idx < len(trns)
            alpha[:, :, 0][mask] = trns[idx[mask]]
            return np.concatenate([rgb, alpha], axis=2)
        return rgb
    if channels == 1:
        return px[:, :, 0]
    if color == 4:  # gray+alpha → (h, w, 2) kept as-is? expand to RGBA
        g = px[:, :, 0:1]
        return np.concatenate([g, g, g, px[:, :, 1:2]], axis=2)
    return px


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, 3|4) uint8 → PNG bytes (filter 0, one IDAT)."""
    import struct
    import zlib

    x = np.asarray(pixels)
    if x.dtype != np.uint8:
        x = np.clip(x, 0, 255).astype(np.uint8)
    if x.ndim == 2:
        color, channels = 0, 1
        body = x[:, :, None]
    elif x.ndim == 3 and x.shape[2] == 3:
        color, channels = 2, 3
        body = x
    elif x.ndim == 3 and x.shape[2] == 4:
        color, channels = 6, 4
        body = x
    else:
        raise ValueError(f"unsupported pixel shape {x.shape}")
    h, w = body.shape[:2]
    raw = bytearray()
    for r in range(h):
        raw.append(0)
        raw.extend(body[r].tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _pil_decode(b: bytes) -> np.ndarray:
    """PIL decode to RGB; raises ImportError when Pillow is absent."""
    import io

    from PIL import Image  # type: ignore

    return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))


def decode_image(blob: bytes, prefer: str | None = None) -> np.ndarray:
    """Magic-dispatched image decode: netpbm (P5/P6), 8-bit PNG,
    JPEG (baseline/progressive, Huffman + arithmetic, 8- and 12-bit),
    GIF (87a/89a, first frame), and WebP (lossless VP8L + lossy VP8)
    natively; anything else (lossless/hierarchical JPEG processes,
    guard-tripped oversizes) via PIL when installed, else a clear error.
    12-bit JPEG is normalized to uint8 by its high 8 bits, matching the
    16-bit-PNG high-byte convention.

    ``prefer`` (default from ``SPARK_GRAFT_IMAGE_DECODER``, else
    ``native``):
      - ``native`` — the pure-Python decoders first; PIL only for the
        exotic tail.  Right where Pillow may be absent (this sandbox)
        and for differential testing.
      - ``system`` — PIL first when importable (the C path is 30–100×
        faster on mainstream formats; see the module-docstring ledger),
        falling back to the native decoders when Pillow is absent or
        rejects the blob (e.g. 12-bit JPEG, which PIL lacks).  Right
        for production clusters.
    """
    import os as _os

    b = bytes(blob)
    prefer = prefer or _os.environ.get(
        "SPARK_GRAFT_IMAGE_DECODER", "native"
    )
    if prefer not in ("native", "system"):
        raise ValueError(f"unknown decode preference: {prefer!r}")
    if prefer == "system":
        try:
            return _pil_decode(b)
        except ImportError:
            pass  # no Pillow on this node: native path below
        except Exception:
            # PIL rejects blobs the native path handles (12-bit JPEG)
            # and vice versa; the native decoders own the canonical
            # error taxonomy, so re-decode and let THEM raise
            pass
    if b[:2] in (b"P5", b"P6"):
        return decode_pnm(b)[0]
    if b[:8] == _PNG_MAGIC:
        return decode_png(b)
    if b[:2] == b"\xff\xd8":
        from tiledb_vector_search_spark.objects.jpeg import decode_jpeg

        try:
            out = decode_jpeg(b)
            if out.dtype == np.uint16:  # 12-bit frame
                out = (out >> 4).astype(np.uint8)
            return out
        except NotImplementedError:
            pass  # lossless/hierarchical process — try PIL below
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from tiledb_vector_search_spark.objects.gif import decode_gif

        try:
            return decode_gif(b)
        except ValueError as e:
            if "GIF_MAX_PIXELS" not in str(e):
                raise
            # CPU-bomb guard tripped — a real decoder can try below
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from tiledb_vector_search_spark.objects.webp import decode_webp

        try:
            return decode_webp(b)
        except NotImplementedError:
            pass  # pixel-guard-tripped oversize — try PIL below
    try:
        return _pil_decode(b)
    except ImportError:
        raise NotImplementedError(
            "this codec needs PIL (not installed); netpbm (P5/P6), 8-bit "
            "PNG, and baseline JPEG decode natively"
        )


# --- MJPEG stream (concatenated JPEGs) ---------------------------------------


def _jpeg_frame_end(blob: bytes, pos: int) -> int:
    """Offset just past the EOI of the JPEG starting at ``pos``.

    A STRUCTURAL walk, not a 0xFFD9 byte scan: marker-segment payloads
    (EXIF thumbnails in APP1, for one) may legally contain FF D9 bytes,
    so frame boundaries must come from segment lengths + entropy-data
    rules (stuffed FF 00 and RSTn continue; any other marker ends the
    entropy run)."""
    import struct as _struct

    n = len(blob)
    p = pos + 2  # past SOI
    while p + 2 <= n:
        if blob[p] != 0xFF:
            raise ValueError(f"JPEG marker desync at {p}")
        m = blob[p + 1]
        if m == 0xFF:
            # T.81 B.1.1.2 fill byte before a marker — decode_jpeg
            # accepts these, so the frame splitter must too (treating
            # the second 0xFF as a marker code read the REAL marker as
            # a segment length and overran the frame)
            p += 1
            continue
        if m == 0xD9:  # EOI
            return p + 2
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone markers
            p += 2
            continue
        seglen = _struct.unpack_from(">H", blob, p + 2)[0]
        p += 2 + seglen
        if m == 0xDA:  # SOS: entropy-coded data follows
            while p + 1 < n:
                if blob[p] != 0xFF:
                    p += 1
                elif blob[p + 1] == 0x00 or 0xD0 <= blob[p + 1] <= 0xD7:
                    p += 2  # stuffed byte / restart marker
                else:
                    break  # real marker (EOI or next segment)
    raise ValueError("truncated JPEG (no EOI)")


def split_mjpeg_stream(blob: bytes) -> list[bytes]:
    """Byte slices of each JPEG in a concatenated-JPEG (MJPEG) stream —
    the layout ``ffmpeg image2pipe -vcodec mjpeg`` emits."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(blob):
        if blob[pos : pos + 2] != b"\xff\xd8":
            raise ValueError(f"MJPEG frame at {pos} missing SOI")
        end = _jpeg_frame_end(blob, pos)
        frames.append(blob[pos:end])
        pos = end
    return frames


def decode_mjpeg_stream(blob: bytes) -> list[np.ndarray]:
    """Decode every frame of an MJPEG stream via the native baseline
    JPEG decoder (``objects/jpeg.py``)."""
    from tiledb_vector_search_spark.objects.jpeg import decode_jpeg

    return [decode_jpeg(f) for f in split_mjpeg_stream(blob)]


def sample_mjpeg_frames(blob: bytes, every_n: int = 1) -> list[np.ndarray]:
    """Every ``every_n``-th frame of an MJPEG stream; unsampled frames
    are SKIPPED at the byte level (EOI scan only — no huffman/IDCT work),
    the same frame-sampling contract as ``sample_pnm_frames``."""
    from tiledb_vector_search_spark.objects.jpeg import decode_jpeg

    return [
        decode_jpeg(f)
        for i, f in enumerate(split_mjpeg_stream(blob))
        if i % every_n == 0
    ]
