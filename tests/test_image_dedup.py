"""pHash image near-dup: kernel parity + banding soundness + planted dups."""

from __future__ import annotations

import numpy as np
import pytest

from tiledb_vector_search_spark.objects.codecs import encode_pnm
from tiledb_vector_search_spark.operators.image_dedup import (
    image_near_duplicates,
    phash64,
    phash64_pixels,
)


def _corpus(n_base: int = 24, seed: int = 7):
    """(id, pnm_blob) rows: n_base random images; every third one gets a
    noised near-copy (id+1000) — textured enough that noise is a small
    perceptual perturbation, not a sign flip of flat coefficients."""
    rng = np.random.default_rng(seed)
    rows, pixels = [], {}
    for i in range(n_base):
        base = rng.integers(0, 256, size=(24, 24))
        # smooth gradient + texture so the DCT spectrum has structure
        gy, gx = np.mgrid[0:24, 0:24]
        img = ((base * 0.3) + (gx * 5 + gy * 3) * ((i % 5) + 1) * 0.4) % 256
        img = img.astype(np.uint8)
        rows.append((i, bytearray(encode_pnm(img))))
        pixels[i] = img
        if i % 3 == 0:
            noise = rng.integers(-6, 7, size=img.shape)
            near = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
            rows.append((1000 + i, bytearray(encode_pnm(near))))
            pixels[1000 + i] = near
    return rows, pixels


@pytest.fixture(scope="module")
def images(spark):
    rows, pixels = _corpus()
    df = spark.createDataFrame(rows, "external_id long, image binary")
    return df, pixels


def test_phash_kernel_matches_reference(spark, images):
    df, pixels = images
    got = {r.external_id: r.phash for r in phash64(df).collect()}
    assert set(got) == set(pixels)
    for i, pix in pixels.items():
        assert got[i] == phash64_pixels(pix), i


def test_phash_undecodable_blob_yields_null(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"not a pnm")), (1, bytearray(encode_pnm(np.zeros((4, 4), dtype=np.uint8))))],
        "external_id long, image binary",
    )
    rows = {r.external_id: r.phash for r in phash64(df).collect()}
    assert rows[0] is None and rows[1] is not None


def test_image_near_duplicates_matches_bruteforce(spark, images):
    """Banding candidates + hamming verify == all-pairs numpy hamming
    (pigeonhole soundness on real hashes), and the planted noised copies
    are found paired with their originals."""
    df, pixels = images
    max_h = 8
    h = {i: phash64_pixels(p) & ((1 << 64) - 1) for i, p in pixels.items()}
    ids = sorted(h)
    want = {
        (a, b, bin(h[a] ^ h[b]).count("1"))
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if bin(h[a] ^ h[b]).count("1") <= max_h
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in image_near_duplicates(df, max_hamming=max_h).collect()
    }
    assert got == want
    planted = {(i, 1000 + i) for i in pixels if i < 1000 and 1000 + i in pixels}
    found_pairs = {(a, b) for a, b, _ in got}
    hit = sum(1 for p in planted if p in found_pairs)
    assert hit >= int(0.8 * len(planted)), (hit, len(planted))
    # distinct random images must not all collapse into one dup cluster
    assert len(found_pairs - planted) < len(planted)


def test_hamming_zero_radius_exact_dups(spark):
    """max_hamming=0 (exact-dup radius) must not overflow LongType: one
    chunk spans the full 64-bit hash, so the band key is the hash itself
    (ADVICE r5: F.lit((1<<64)-1) was a plan-time NumberFormatException)."""
    from tiledb_vector_search_spark.operators.hamming import hamming_near_pairs

    rows = [
        (0, -1),              # all-ones hash (sign bit set)
        (1, -1),              # exact dup of 0
        (2, 7),
        (3, 7),               # exact dup of 2
        (4, 6),               # hamming 1 from 7 — must NOT pair at radius 0
        (5, (1 << 62) + 5),
    ]
    df = spark.createDataFrame(rows, "external_id long, hash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_pairs(df, bits=64, max_hamming=0).collect()
    }
    assert got == {(0, 1, 0), (2, 3, 0)}


def test_frozen_fingerprints_fresh():
    """The committed fingerprint fixture must equal what the generator
    produces from the pinned corpus — a kernel change that shifts any
    hash shows up here, not as a silent driver-row drift."""
    import importlib.util
    import os

    import pyarrow.parquet as pq

    gen_dir = os.path.join(
        os.path.dirname(__file__), "golden", "phash"
    )
    spec = importlib.util.spec_from_file_location(
        "phash_generate", os.path.join(gen_dir, "generate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    want = mod.corpus_hashes()
    tb = pq.read_table(os.path.join(gen_dir, "fingerprints.parquet"))
    got = list(
        zip(tb.column("external_id").to_pylist(), tb.column("phash").to_pylist())
    )
    assert got == want


def test_lossy_vp8_reencode_pairs_with_png_original(spark):
    """The lossy-VP8 codec-parity gate at the OPERATOR level: a corpus
    of PNG originals plus native lossy-VP8 re-encodes (different bytes,
    same pictures) — image_near_duplicates must pair every re-encode
    with its original, and unrelated images must not pair."""
    import numpy as np

    from tiledb_vector_search_spark.objects.codecs import encode_png
    from tiledb_vector_search_spark.objects.vp8_encode import (
        encode_vp8_lossy_image,
    )
    from tiledb_vector_search_spark.operators.image_dedup import (
        image_near_duplicates,
    )

    rng = np.random.default_rng(23)
    rows = []
    for i in range(6):
        img = np.clip(
            np.cumsum(rng.integers(-5, 6, size=(48, 48, 3)), axis=0) + 120,
            0, 255,
        ).astype(np.uint8)
        rows.append((i, encode_png(img)))
        if i < 3:
            rows.append((i + 1000, encode_vp8_lossy_image(img, y_ac_qi=12)))
    df = spark.createDataFrame(rows, "external_id long, image binary")
    pairs = {
        (r.id_a, r.id_b)
        for r in image_near_duplicates(df, max_hamming=8).collect()
    }
    for i in range(3):
        assert (i, i + 1000) in pairs or (i + 1000, i) in pairs, (i, pairs)
    # unrelated random-walk images shouldn't collide at radius 8
    assert all(a % 1000 == b % 1000 for a, b in pairs), pairs


def test_gif_reencode_pairs_with_png_original(spark):
    """The GIF codec-parity gate at the OPERATOR level: posterized
    (<=125-color) originals stored as PNG plus native GIF re-encodes —
    different container bytes, IDENTICAL pixels (GIF is lossless within
    its palette budget), so image_near_duplicates must pair each
    re-encode with its original at hamming distance 0."""
    import numpy as np

    from tiledb_vector_search_spark.objects.codecs import encode_png
    from tiledb_vector_search_spark.objects.gif import encode_gif
    from tiledb_vector_search_spark.operators.image_dedup import (
        image_near_duplicates,
    )

    rng = np.random.default_rng(29)
    rows = []
    for i in range(6):
        img = np.clip(
            np.cumsum(rng.integers(-5, 6, size=(48, 48, 3)), axis=0) + 120,
            0, 255,
        ).astype(np.uint8)
        img = (img // 52) * 52  # posterize: <=125 distinct colors
        rows.append((i, encode_png(img)))
        if i < 3:
            rows.append((i + 1000, encode_gif([img])))
    df = spark.createDataFrame(rows, "external_id long, image binary")
    pairs = {
        (r.id_a, r.id_b)
        for r in image_near_duplicates(df, max_hamming=0).collect()
    }
    for i in range(3):
        assert (i, i + 1000) in pairs or (i + 1000, i) in pairs, (i, pairs)
    assert all(a % 1000 == b % 1000 for a, b in pairs), pairs


def test_combination_banding_adversarial_completeness(spark):
    """Worst-case completeness of the block-pair pigeonhole: flip
    EXACTLY max_hamming bits spread one-per-block (dirtying the maximum
    number of blocks) and at every packing extreme; every pair at
    radius <= max_hamming must surface, radius max_hamming+1 must not
    (verify step).  Brute-force numpy oracle over all pairs."""
    import itertools

    import numpy as np

    from tiledb_vector_search_spark.operators.hamming import (
        hamming_near_pairs,
    )

    rng = np.random.default_rng(11)
    max_h = 8
    blocks = max_h + 2
    block_bits = 64 // blocks  # 6
    base = int(rng.integers(0, 2**63))
    rows = [(0, base)]
    # one-per-block spread (max dirty blocks), low/high packed, over-radius
    spread = base
    for c in range(max_h):
        spread ^= 1 << (c * block_bits)
    rows.append((1, spread))
    rows.append((2, base ^ ((1 << max_h) - 1)))          # all-low pack
    rows.append((3, base ^ (((1 << max_h) - 1) << 55)))  # high/orphan pack
    over = spread ^ (1 << ((max_h) * block_bits))        # radius max_h+1
    rows.append((4, over))
    for i in range(5, 40):  # organic random far-away fill
        rows.append((i, int(rng.integers(0, 2**63))))
    df = spark.createDataFrame(rows, "external_id long, hash long")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_pairs(
            df, bits=64, max_hamming=max_h, hash_col="hash"
        ).collect()
    )
    h = np.array([x for _, x in rows], dtype=np.uint64)
    ids = np.array([i for i, _ in rows])
    want = []
    for i, j in itertools.combinations(range(len(rows)), 2):
        d = int(bin(int(h[i]) ^ int(h[j])).count("1"))
        if d <= max_h:
            a, b = sorted((int(ids[i]), int(ids[j])))
            want.append((a, b, d))
    assert got == sorted(want)
    assert (0, 1, max_h) in got and (0, 2, max_h) in got
    assert (0, 3, max_h) in got
    assert not any(a == 0 and b == 4 for a, b, _ in got)


def test_phash_frame_skips_null_ids(spark):
    """A NULL external_id row must be skipped, not kill the task: the
    id conversion sat OUTSIDE the per-row try, so one bad row failed
    the whole mapInPandas stage deterministically."""
    import numpy as np

    from tiledb_vector_search_spark.objects.codecs import encode_pnm
    from tiledb_vector_search_spark.operators.image_dedup import phash64

    img = encode_pnm(
        np.random.default_rng(1).integers(0, 256, (16, 16)).astype(np.uint8)
    )
    df = spark.createDataFrame(
        [(1, bytearray(img)), (None, bytearray(img)), (2, None)],
        "external_id long, image binary",
    )
    rows = {r.external_id: r.phash for r in phash64(df).collect()}
    assert set(rows) == {1, 2}  # the NULL-id row vanished, task alive
    assert rows[1] is not None and rows[2] is None
