"""Encode JPEGs with the SYSTEM libjpeg via ctypes — the independent
encoder for the arithmetic-coding differential tests.

Usage (subprocess — libjpeg's default error manager exits the process,
so callers isolate it):

    python tools/encode_arith_jpeg.py W H CHANNELS QUALITY MODE \
        [RESTART] [progressive] [cond=L,U,K] < raw_pixels > out.jpg

MODE is ``arith`` or ``huff``.  The raw input is H*W*CHANNELS uint8
bytes.  ``cond=L,U,K`` overrides the table-0 arithmetic conditioning
(DC L/U thresholds + AC Kx) away from the 0/1/5 defaults — the poke is
validated against the emitted DAC marker payload.  The script validates its own struct-offset poking by checking
the produced markers (SOF9/SOFA for arith, DRI for restart) and exits
nonzero on mismatch — a wrong ABI guess can't silently hand tests a
Huffman file.

The jpeg_compress_struct ABI is version-locked by
``jpeg_CreateCompress(…, 62, 520)`` (the library itself rejects a size
mismatch); the head of the struct (err/mem/…/in_color_space) is the
stable public layout, and the arith_code flag is located by scanning
for the 48-byte arith-conditioning default signature
(L[16]=0, U[16]=1, Kx[16]=5) that jpeg_set_defaults writes.
"""

import ctypes
import sys

STRUCT_SIZE = 520  # libjpeg 6.2 ABI, validated by jpeg_CreateCompress


def main() -> int:
    w, h, ch, quality = map(int, sys.argv[1:5])
    mode = sys.argv[5]
    restart = next(
        (int(a) for a in sys.argv[6:] if a.isdigit()), 0
    )
    progressive = "progressive" in sys.argv[6:]
    raw = sys.stdin.buffer.read()
    assert len(raw) == w * h * ch, (len(raw), w, h, ch)

    lib = ctypes.CDLL("libjpeg.so.62")
    lib.jpeg_std_error.restype = ctypes.c_void_p
    lib.jpeg_std_error.argtypes = [ctypes.c_void_p]
    lib.jpeg_CreateCompress.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t,
    ]
    for name in (
        "jpeg_mem_dest", "jpeg_set_defaults", "jpeg_start_compress",
        "jpeg_finish_compress", "jpeg_destroy_compress",
        "jpeg_simple_progression",
    ):
        getattr(lib, name).argtypes = [ctypes.c_void_p] + (
            [ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_ulong)]
            if name == "jpeg_mem_dest"
            else [ctypes.c_int] if name == "jpeg_start_compress" else []
        )
    lib.jpeg_set_quality.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.jpeg_write_scanlines.restype = ctypes.c_uint
    lib.jpeg_write_scanlines.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint,
    ]

    errbuf = (ctypes.c_ubyte * 1024)()
    err = lib.jpeg_std_error(ctypes.addressof(errbuf))
    cinfo = (ctypes.c_ubyte * STRUCT_SIZE)()
    base = ctypes.addressof(cinfo)
    ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = err
    lib.jpeg_CreateCompress(base, 62, STRUCT_SIZE)

    outbuf = ctypes.c_void_p()
    outsize = ctypes.c_ulong()
    lib.jpeg_mem_dest(base, ctypes.byref(outbuf), ctypes.byref(outsize))

    # stable head-of-struct offsets (public libjpeg ABI): image_width 48,
    # image_height 52, input_components 56, in_color_space 60
    u32 = ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_uint32))
    u32[12] = w
    u32[13] = h
    u32[14] = ch
    u32[15] = 2 if ch == 3 else 1  # JCS_RGB / JCS_GRAYSCALE
    lib.jpeg_set_defaults(base)
    lib.jpeg_set_quality(base, quality, 1)

    # locate arith_code via the conditioning-default signature
    sig = bytes(16) + bytes([1]) * 16 + bytes([5]) * 16
    mem = bytes(cinfo)
    at = mem.find(sig)
    assert at > 0, "arith-conditioning signature not found"
    cond = next((a for a in sys.argv[6:] if a.startswith("cond=")), None)
    if cond:
        dc_l, dc_u, ac_k = map(int, cond[5:].split(","))
        cinfo[at] = dc_l
        cinfo[at + 16] = dc_u
        cinfo[at + 32] = ac_k
    else:
        dc_l, dc_u, ac_k = 0, 1, 5
    num_scans_off = (at + 48 + 3) & ~3
    scan_info_off = (num_scans_off + 4 + 7) & ~7
    arith_off = scan_info_off + 8 + 4  # after raw_data_in
    if mode == "arith":
        u32 = ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_uint32))
        u32[arith_off // 4] = 1
    if restart:
        u32[(arith_off + 20) // 4] = restart
    if progressive:
        lib.jpeg_simple_progression(base)

    lib.jpeg_start_compress(base, 1)
    row_t = ctypes.c_void_p * 1
    stride = w * ch
    for y in range(h):
        rowbuf = ctypes.create_string_buffer(
            raw[y * stride : (y + 1) * stride], stride
        )
        rows = row_t(ctypes.cast(rowbuf, ctypes.c_void_p))
        n = lib.jpeg_write_scanlines(base, rows, 1)
        assert n == 1
    lib.jpeg_finish_compress(base)
    blob = ctypes.string_at(outbuf.value, outsize.value)
    lib.jpeg_destroy_compress(base)

    # self-validate the ABI poking via the produced markers
    markers = {
        blob[i + 1] for i in range(len(blob) - 1) if blob[i] == 0xFF
    }
    if mode == "arith":
        assert markers & {0xC9, 0xCA}, "arith_code poke missed (no SOF9/10)"
    else:
        assert not markers & {0xC9, 0xCA}
    if restart:
        assert 0xDD in markers, "restart poke missed (no DRI)"
    if progressive:
        assert markers & {0xC2, 0xCA}, "no progressive SOF"
    if mode == "arith" and cond:
        # the DAC payload must carry the poked conditioning for table 0
        i = blob.find(b"\xff\xcc")
        assert i >= 0, "no DAC marker"
        n = int.from_bytes(blob[i + 2 : i + 4], "big")
        dac = blob[i + 4 : i + 2 + n]
        pairs = {dac[j]: dac[j + 1] for j in range(0, len(dac), 2)}
        assert pairs.get(0x00) == (dc_u << 4) | dc_l, "DC cond poke missed"
        assert pairs.get(0x10) == ac_k, "AC cond poke missed"
    sys.stdout.buffer.write(blob)
    return 0


if __name__ == "__main__":
    sys.exit(main())
