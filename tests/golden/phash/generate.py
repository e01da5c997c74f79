"""Freeze the perceptual-hash fixture: deterministic synthetic images →
64-bit DCT pHash → ``fingerprints.parquet``.

The HASH KERNEL (DCT, not SQL-expressible) is pinned by the pytest
oracles in ``tests/test_image_dedup.py``; this fixture freezes its
int64 outputs so the BAND-JOIN + ``bit_count(xor)`` verify step — which
IS SQL-expressible — gets a full driver/DuckDB correctness row
(``phash_hamming_neardup``).  Regenerate with::

    PYTHONPATH=/root/repo python tests/golden/phash/generate.py

tests/test_image_dedup.py::test_frozen_fingerprints_fresh fails if the
committed bytes drift from what this script produces.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def corpus_hashes() -> list[tuple[int, int]]:
    from tiledb_vector_search_spark.operators.image_dedup import (
        phash64_pixels,
    )

    rng = np.random.default_rng(7)
    rows: list[tuple[int, int]] = []
    for i in range(48):
        base = rng.integers(0, 256, size=(24, 24))
        gy, gx = np.mgrid[0:24, 0:24]
        img = ((base * 0.3) + (gx * 5 + gy * 3) * ((i % 5) + 1) * 0.4) % 256
        img = img.astype(np.uint8)
        rows.append((i, int(np.int64(np.uint64(phash64_pixels(img))))))
        if i % 3 == 0:  # planted near-copy: small noise, nearby hash
            noise = rng.integers(-6, 7, size=img.shape)
            near = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
            rows.append(
                (1000 + i, int(np.int64(np.uint64(phash64_pixels(near)))))
            )
    return rows


def main() -> None:
    rows = corpus_hashes()
    table = pa.table(
        {
            "external_id": pa.array([r[0] for r in rows], pa.int64()),
            "phash": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    out = os.path.join(os.path.dirname(__file__), "fingerprints.parquet")
    pq.write_table(table, out, compression="snappy")
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
