"""Reference ``utils`` parity: driver-side vecs-file loaders/writers.

The reference exports ``tiledb.vector_search.utils`` with numpy
``load_fvecs/load_ivecs/load_bvecs`` and matching writers
(``utils.py:53-110``).  The engine's DISTRIBUTED readers live in
:mod:`.sources.vecs` (range-chunked ``mapInPandas`` decode — the scale
path); these driver-side forms exist for the small files where the
reference uses them (query sets, ground truth, fixtures).
"""

from __future__ import annotations

import numpy as np

from tiledb_vector_search_spark.sources.vecs import (  # noqa: F401
    write_bvecs,
    write_fvecs,
    write_ivecs,
)

__all__ = [
    "load_fvecs",
    "load_ivecs",
    "load_bvecs",
    "write_fvecs",
    "write_ivecs",
    "write_bvecs",
]


def _load_vecs_t(path: str, dtype: np.dtype) -> np.ndarray:
    """(n, d) matrix from the {f,i,b}vecs layout: per-record int32 dim
    header then ``d`` values (reference ``_load_vecs_t``,
    ``utils.py:53-75``)."""
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size == 0:
        return np.empty((0, 0), dtype=dtype)
    dim = int(np.frombuffer(raw[:4].tobytes(), dtype=np.int32)[0])
    itemsize = np.dtype(dtype).itemsize
    rec = 4 + dim * itemsize
    if raw.size % rec != 0:
        raise ValueError(f"{path}: size {raw.size} not a multiple of record {rec}")
    n = raw.size // rec
    mat = raw.reshape(n, rec)[:, 4:]
    out = np.frombuffer(mat.tobytes(), dtype=dtype).reshape(n, dim)
    # every record's dim header must agree
    dims = np.frombuffer(raw.reshape(n, rec)[:, :4].tobytes(), dtype=np.int32)
    if not (dims == dim).all():
        raise ValueError(f"{path}: inconsistent dimension headers")
    return out


def load_fvecs(path: str) -> np.ndarray:
    return _load_vecs_t(path, np.float32)


def load_ivecs(path: str) -> np.ndarray:
    return _load_vecs_t(path, np.int32)


def load_bvecs(path: str) -> np.ndarray:
    return _load_vecs_t(path, np.uint8)
