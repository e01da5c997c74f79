"""Decode JPEGs with the SYSTEM libjpeg via ctypes — the independent
decoder for the arithmetic-coding differential tests (the twin of
``tools/encode_arith_jpeg.py``; same version-locked ABI discipline).

Usage (subprocess — libjpeg's default error manager exits the process,
so callers isolate it):

    python tools/decode_jpeg_libjpeg.py < in.jpg > pixels.bin

Batch mode (one process, many blobs — a fatal decode error kills the
batch, so callers match responses by count and treat the remainder as
failed):

    python tools/decode_jpeg_libjpeg.py --batch < stream > responses

Input stream: repeated ``u32le length || blob``; a zero length ends the
stream.  Each response is ``u32le w || u32le h || u32le ch || pixels``
(h*w*ch uint8, grayscale or RGB), flushed per item.

``--coef`` (combinable with ``--batch``) emits raw quantized DCT
coefficients instead of pixels, via ``jpeg_read_coefficients`` +
``mem->access_virt_barray``: per response ``u32le ncomp`` then, per
component, ``u32le wblocks || u32le hblocks`` followed by
``hblocks*wblocks*64`` int16le coefficients (blocks in row-major
order, each block in natural/raster order as libjpeg stores it).

The jpeg_decompress_struct ABI is version-locked by
``jpeg_CreateDecompress(…, 62, 632)`` (the library itself rejects a
size mismatch — the 632 was read off that error message).  Field
offsets for the stable public head of the struct were located by a
distinctive-dimension probe and are sanity-checked on every decode:
image_width 48, image_height 52, num_components 56, out_color_space
64, output_width 136, output_height 140, output_components 148.
"""

import ctypes
import struct
import sys

STRUCT_SIZE = 632  # libjpeg 6.2 decompress ABI, validated by the lib

OFF_IMAGE_WIDTH = 48
OFF_NUM_COMPONENTS = 56
OFF_OUT_COLOR_SPACE = 64
OFF_OUTPUT_WIDTH = 136
OFF_OUTPUT_HEIGHT = 140
OFF_OUTPUT_COMPONENTS = 148


def _bind(lib):
    lib.jpeg_std_error.restype = ctypes.c_void_p
    lib.jpeg_std_error.argtypes = [ctypes.c_void_p]
    lib.jpeg_CreateDecompress.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t,
    ]
    lib.jpeg_mem_src.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_ulong,
    ]
    lib.jpeg_read_header.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.jpeg_start_decompress.argtypes = [ctypes.c_void_p]
    lib.jpeg_read_scanlines.restype = ctypes.c_uint
    lib.jpeg_read_scanlines.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint,
    ]
    lib.jpeg_finish_decompress.argtypes = [ctypes.c_void_p]
    lib.jpeg_destroy_decompress.argtypes = [ctypes.c_void_p]


def decode(lib, err, blob: bytes) -> tuple[int, int, int, bytes]:
    cinfo = (ctypes.c_ubyte * STRUCT_SIZE)()
    base = ctypes.addressof(cinfo)
    ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = err
    lib.jpeg_CreateDecompress(base, 62, STRUCT_SIZE)
    try:
        lib.jpeg_mem_src(base, blob, len(blob))
        lib.jpeg_read_header(base, 1)
        u32 = ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_uint32))
        w_hdr = u32[OFF_IMAGE_WIDTH // 4]
        nc = u32[OFF_NUM_COMPONENTS // 4]
        assert 0 < w_hdr < 1 << 16 and nc in (1, 3, 4), (w_hdr, nc)
        # normalize the output: grayscale stays gray, anything else RGB
        u32[OFF_OUT_COLOR_SPACE // 4] = 1 if nc == 1 else 2
        lib.jpeg_start_decompress(base)
        w = u32[OFF_OUTPUT_WIDTH // 4]
        h = u32[OFF_OUTPUT_HEIGHT // 4]
        ch = u32[OFF_OUTPUT_COMPONENTS // 4]
        assert w == w_hdr and 0 < h < 1 << 16 and ch in (1, 3), (w, h, ch)
        stride = w * ch
        rowbuf = ctypes.create_string_buffer(stride)
        rows = (ctypes.c_void_p * 1)(ctypes.cast(rowbuf, ctypes.c_void_p))
        out = bytearray()
        for _y in range(h):
            n = lib.jpeg_read_scanlines(base, rows, 1)
            assert n == 1, "scanline read stalled"
            out += rowbuf.raw[:stride]
        lib.jpeg_finish_decompress(base)
        return w, h, ch, bytes(out)
    finally:
        lib.jpeg_destroy_decompress(base)


def _sof_block_dims(blob: bytes) -> list[tuple[int, int]]:
    """Per-component (wblocks, hblocks) from the SOF header — computed
    here instead of reading libjpeg's comp_info (whose struct offset is
    not part of the stable head ABI)."""
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = blob[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", blob, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            data = blob[pos + 4 : pos + 2 + length]
            h, w = struct.unpack_from(">HH", data, 1)
            nc = data[5]
            samp = [
                (data[7 + 3 * c] >> 4, data[7 + 3 * c] & 0x0F)
                for c in range(nc)
            ]
            hmax = max(s[0] for s in samp)
            vmax = max(s[1] for s in samp)
            def blocks(total: int, s: int, smax: int) -> int:
                comp = -(-total * s // smax)  # ceil-scaled component size
                return -(-comp // 8)

            return [
                (blocks(w, sh, hmax), blocks(h, sv, vmax))
                for sh, sv in samp
            ]
        pos += 2 + length
    raise ValueError("no SOF marker")


def decode_coefs(lib, err, blob: bytes) -> bytes:
    """Raw quantized coefficients via jpeg_read_coefficients +
    mem->access_virt_barray (function-pointer index 8 of the public
    jpeg_memory_mgr layout)."""
    dims = _sof_block_dims(blob)
    cinfo = (ctypes.c_ubyte * STRUCT_SIZE)()
    base = ctypes.addressof(cinfo)
    ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = err
    lib.jpeg_CreateDecompress(base, 62, STRUCT_SIZE)
    try:
        lib.jpeg_mem_src(base, blob, len(blob))
        lib.jpeg_read_header(base, 1)
        lib.jpeg_read_coefficients.restype = ctypes.POINTER(ctypes.c_void_p)
        lib.jpeg_read_coefficients.argtypes = [ctypes.c_void_p]
        barrays = lib.jpeg_read_coefficients(base)
        assert barrays, "jpeg_read_coefficients failed"
        mem = ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[1]
        access_t = ctypes.CFUNCTYPE(
            ctypes.POINTER(ctypes.c_void_p),  # JBLOCKARRAY (rows of ptrs)
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_uint, ctypes.c_uint, ctypes.c_int,
        )
        access = access_t(
            ctypes.cast(mem, ctypes.POINTER(ctypes.c_void_p))[8]
        )
        out = bytearray(struct.pack("<I", len(dims)))
        for ci, (wb, hb) in enumerate(dims):
            out += struct.pack("<II", wb, hb)
            for row in range(hb):
                rows = access(base, barrays[ci], row, 1, 0)
                assert rows and rows[0], "virt barray access failed"
                out += ctypes.string_at(rows[0], wb * 64 * 2)
        lib.jpeg_finish_decompress(base)
        return bytes(out)
    finally:
        lib.jpeg_destroy_decompress(base)


def main() -> int:
    lib = ctypes.CDLL("libjpeg.so.62")
    _bind(lib)
    errbuf = (ctypes.c_ubyte * 1024)()
    err = lib.jpeg_std_error(ctypes.addressof(errbuf))
    out = sys.stdout.buffer
    coef_mode = "--coef" in sys.argv[1:]

    def one(blob: bytes) -> None:
        if coef_mode:
            out.write(decode_coefs(lib, err, blob))
        else:
            w, h, ch, px = decode(lib, err, blob)
            out.write(struct.pack("<III", w, h, ch))
            out.write(px)

    if "--batch" in sys.argv[1:]:
        src = sys.stdin.buffer
        while True:
            hdr = src.read(4)
            if len(hdr) < 4:
                break
            (n,) = struct.unpack("<I", hdr)
            if n == 0:
                break
            one(src.read(n))
            out.flush()
        return 0
    one(sys.stdin.buffer.read())
    return 0


if __name__ == "__main__":
    sys.exit(main())
