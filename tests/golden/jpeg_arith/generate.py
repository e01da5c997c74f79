"""Regenerate the frozen arithmetic-JPEG fixtures.

Run from the repo root (requires the system libjpeg.so.62):

    python tests/golden/jpeg_arith/generate.py

Each fixture is an arithmetic-entropy JPEG produced by the system
libjpeg (via ``tools/encode_arith_jpeg.py``) plus the expected decoded
pixels (``.npy``).  The expected pixels are taken from the HUFFMAN twin
of the same source image decoded through this package — the entropy
layer is lossless, so the arithmetic file must decode byte-identically,
and the Huffman path is independently pinned against hand-derived
streams in tests/test_jpeg_codec.py.

tests/test_jpeg_arith.py decodes the frozen .jpg files hermetically
(no libjpeg needed at test time) and, when libjpeg is present, also
freshness-gates the fixtures by re-encoding.
"""

import pathlib
import subprocess
import sys

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parents[2]
sys.path.insert(0, str(ROOT))

from tiledb_vector_search_spark.objects.jpeg import decode_jpeg  # noqa: E402

# name -> (w, h, ch, quality, extra encoder args)
FIXTURES = {
    "gray_seq": (16, 16, 1, 90, []),
    "color_seq_restart": (24, 17, 3, 50, ["2"]),
    "color_progressive": (20, 20, 3, 85, ["progressive"]),
    "gray_cond": (32, 24, 1, 85, ["cond=1,2,20"]),
}


def source_pixels(w: int, h: int, ch: int) -> bytes:
    rng = np.random.default_rng(w * 1000 + h * 10 + ch)
    shape = (h, w, ch) if ch > 1 else (h, w)
    base = np.linspace(0, 255, int(np.prod(shape))).reshape(shape)
    noise = rng.integers(-70, 70, size=shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8).tobytes()


def encode(raw: bytes, w, h, ch, q, mode, extra) -> bytes:
    args = [
        sys.executable, str(ROOT / "tools" / "encode_arith_jpeg.py"),
        str(w), str(h), str(ch), str(q), mode, *extra,
    ]
    p = subprocess.run(args, input=raw, capture_output=True)
    if p.returncode != 0:
        raise RuntimeError(p.stderr.decode()[-500:])
    return p.stdout


def main() -> None:
    for name, (w, h, ch, q, extra) in FIXTURES.items():
        raw = source_pixels(w, h, ch)
        huff = encode(raw, w, h, ch, q, "huff",
                      [a for a in extra if not a.startswith("cond=")])
        arith = encode(raw, w, h, ch, q, "arith", extra)
        expected = decode_jpeg(huff)
        got = decode_jpeg(arith)
        assert np.array_equal(expected, got), f"{name}: twin mismatch"
        (HERE / f"{name}.jpg").write_bytes(arith)
        np.save(HERE / f"{name}.npy", expected)
        print(f"{name}: {len(arith)} bytes, pixels {expected.shape}")


if __name__ == "__main__":
    main()
