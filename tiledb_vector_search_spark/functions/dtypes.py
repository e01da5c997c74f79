"""Byte-width vector dtypes: uint8 / int8 vectors stored as ``binary``.

Reference dispatch: ``apis/python/src/tiledb/vector_search/module.py:114-121,
205-212`` — the reference queries uint8/int8 corpora (bigann is u8) natively,
never promoting the stored bytes to float32.  At 100 TB a u8 corpus stored
as ``array<float>`` is a 4× storage and scan-IO penalty, exactly the waste
PQ-style byte codes exist to avoid.

Spark-first design (the ``indexes/ivf_pq.py`` code-column pattern): a byte
vector lives in a ``binary`` column of exactly ``dims`` bytes.  Parquet
BYTE_ARRAY keeps it ~1 byte/element on disk; every kernel decodes with a
zero-copy ``np.frombuffer`` and promotes to float64 IN THE KERNEL ONLY.
Catalyst expression paths that need an array column get an explicit
``unpack_vectors`` mapInPandas promotion — a visible cost, never a silent
default.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FLOAT32 = "float32"

# vector_dtype meta value -> numpy dtype of the packed binary column
BYTE_DTYPES: dict[str, np.dtype] = {
    "uint8": np.dtype(np.uint8),
    "int8": np.dtype(np.int8),
}

VECTOR_DTYPES = (FLOAT32, *BYTE_DTYPES)


def is_byte_dtype(vector_dtype: str) -> bool:
    if vector_dtype not in VECTOR_DTYPES:
        raise ValueError(
            f"unknown vector_dtype {vector_dtype!r}; expected one of {VECTOR_DTYPES}"
        )
    return vector_dtype in BYTE_DTYPES


def decode_matrix(series, vector_dtype: str) -> np.ndarray:
    """(n, dims) float64 from a pandas Series of array values OR packed
    bytes — the single promotion point every kernel shares."""
    if vector_dtype in (FLOAT32, "float64"):
        # both arrive as array-valued rows; the float64 variant simply
        # skips the f32 rounding upstream (oracle-exact pipelines)
        return np.array(list(series), dtype=np.float64)
    raw = np.frombuffer(b"".join(series), dtype=BYTE_DTYPES[vector_dtype])
    return raw.reshape(len(series), -1).astype(np.float64)


def pack_vectors(
    df: DataFrame, vector_dtype: str, vector_col: str = "vector"
) -> DataFrame:
    """Numeric-array column → ``binary`` packed bytes (1 byte/element).

    Values must already be in the dtype's range (u8: 0..255, i8: -128..127);
    out-of-range inputs raise in the kernel rather than wrap silently.
    """
    import pandas as pd

    np_dt = BYTE_DTYPES[vector_dtype]
    info = np.iinfo(np_dt)
    schema = ", ".join(
        f"`{f.name}` binary" if f.name == vector_col
        else f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
    )

    def pack(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vector_col]), dtype=np.float64)
            if ((x < info.min) | (x > info.max)).any() or (x != np.rint(x)).any():
                raise ValueError(
                    f"vector values outside {vector_dtype} range or non-integral"
                )
            packed = x.astype(np_dt)
            out = pdf.copy()
            out[vector_col] = [packed[i].tobytes() for i in range(len(packed))]
            yield out

    return df.mapInPandas(pack, schema=schema)


def ensure_packed(
    df: DataFrame, vector_dtype: str, vector_col: str = "vector"
) -> DataFrame:
    """Pack a numeric-array vector column; pass an already-``binary``
    column through untouched (e.g. a ``read_vectors(keep_bytes=True)``
    source — no decode/re-pack cycle)."""
    if dict(df.dtypes).get(vector_col) == "binary":
        return df
    return pack_vectors(df, vector_dtype, vector_col)


def unpack_vectors(
    df: DataFrame, vector_dtype: str, vector_col: str = "vector"
) -> DataFrame:
    """``binary`` packed bytes → ``array<float>`` (explicit promotion for
    Catalyst expression paths and float-typed unions)."""
    import pandas as pd

    np_dt = BYTE_DTYPES[vector_dtype]
    schema = ", ".join(
        f"`{f.name}` array<float>" if f.name == vector_col
        else f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
    )

    def unpack(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.frombuffer(b"".join(pdf[vector_col]), dtype=np_dt).reshape(
                len(pdf), -1
            ).astype(np.float32)
            out = pdf.copy()
            out[vector_col] = list(mat)
            yield out

    return df.mapInPandas(unpack, schema=schema)
