"""Object readers: DataFrame-native sources for the object pipeline.

Reference ABC: ``object_readers/object_reader.py:8-100`` (``get_partitions``
/ ``read_objects`` / ``read_objects_by_external_ids`` /
``metadata_attributes``); directory readers
``object_readers/directory_reader.py:20-643`` (text chunking at
``:214-326``, images at ``:507-643``).

Spark mapping: a reader produces a DataFrame with an ``external_id`` column,
one or more payload columns, and metadata columns.  The reference's
``ObjectPartition`` machinery is Spark's input-split planning — a reader
here never enumerates partitions by hand.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiledb_vector_search_spark.schemas import ID_COL


class ObjectReader(ABC):
    """Reads objects as a DataFrame (reference ``ObjectReader`` ABC)."""

    @abstractmethod
    def read_objects(self, spark: SparkSession) -> DataFrame:
        """All objects: (external_id, <payload cols>, <metadata cols>)."""

    def read_objects_by_external_ids(
        self, spark: SparkSession, ids: DataFrame | list[int]
    ) -> DataFrame:
        """Objects for the given ids — a left-semi join against the source
        (reference ``object_reader.py:94-100``)."""
        if isinstance(ids, list):
            from tiledb_vector_search_spark.session import small_df

            ids = small_df(spark, [(int(i),) for i in ids], f"{ID_COL} long")
        return self.read_objects(spark).join(
            F.broadcast(ids.select(ID_COL)), ID_COL, "left_semi"
        )

    def metadata_attributes(self) -> list[str]:
        """Names of filterable metadata columns (may be empty)."""
        return []

    def payload_columns(self) -> list[str]:
        """Names of the object payload columns fed to the embedding."""
        return []


class DataFrameObjectReader(ObjectReader):
    """Wrap any DataFrame-producing source (parquet path or DataFrame).

    The general-purpose reader: at 100 TB the object corpus is a table.
    """

    def __init__(
        self,
        path: str | None = None,
        df: DataFrame | None = None,
        id_col: str = ID_COL,
        payload_cols: list[str] | None = None,
        metadata_cols: list[str] | None = None,
    ):
        if (path is None) == (df is None):
            raise ValueError("exactly one of path/df required")
        self.path = path
        self._df = df
        self.id_col = id_col
        self._payload = payload_cols or []
        self._metadata = metadata_cols or []

    def __getstate__(self):
        # a live DataFrame captures the SparkContext and cannot ship in the
        # cloudpickled group blob; path-backed readers reopen cleanly,
        # in-memory ones only support same-session use
        state = dict(self.__dict__)
        state["_df"] = None
        return state

    def read_objects(self, spark: SparkSession) -> DataFrame:
        if self._df is not None:
            df = self._df.withColumnRenamed(self.id_col, ID_COL)
        elif self.path is None:
            raise ValueError(
                "in-memory DataFrameObjectReader cannot be reopened from "
                "storage; create it with a path for persistent indexes"
            )
        else:
            df = spark.read.parquet(self.path).withColumnRenamed(
                self.id_col, ID_COL
            )
        # type-level id validation: the embedding kernels decode ids
        # with to_numpy(dtype=int64), which TRUNCATES a float id column
        # silently (wave-6 id-contract class)
        from tiledb_vector_search_spark.schemas import integral_id_col

        return df.withColumn(
            ID_COL, integral_id_col(df, ID_COL, "DataFrameObjectReader")
        )

    def metadata_attributes(self) -> list[str]:
        return list(self._metadata)

    def payload_columns(self) -> list[str]:
        return list(self._payload)


_SEPARATORS = ("\n\n", "\n", " ")


def _split_text(
    text: str, chunk_size: int, overlap: int, _seps: tuple[str, ...] = _SEPARATORS
) -> list[str]:
    """Recursive character splitting (separator hierarchy ¶ → line → space),
    the same strategy as the reference's ``RecursiveCharacterTextSplitter``
    usage (``directory_reader.py:214-326``) without the langchain dependency.
    Recursion strictly descends the separator list, so it always terminates
    in hard character slices."""
    if len(text) <= chunk_size:
        return [text] if text.strip() else []
    if not _seps:
        step = max(1, chunk_size - overlap)
        return [
            c for c in (text[i : i + chunk_size] for i in range(0, len(text), step))
            if c.strip()
        ]
    sep, rest = _seps[0], _seps[1:]
    parts = text.split(sep)
    if len(parts) == 1:
        return _split_text(text, chunk_size, overlap, rest)
    chunks: list[str] = []
    cur = ""
    for p in parts:
        nxt = (cur + sep + p) if cur else p
        if len(nxt) > chunk_size and cur:
            chunks.append(cur)
            tail = cur[-overlap:] if overlap else ""
            cur = (tail + sep + p) if tail else p
        else:
            cur = nxt
    if cur.strip():
        chunks.append(cur)
    out: list[str] = []
    for c in chunks:
        if len(c) > chunk_size:
            out.extend(_split_text(c, chunk_size, overlap, rest))
        else:
            out.append(c)
    return [c for c in out if c.strip()]


class DirectoryTextReader(ObjectReader):
    """Text files under a directory, chunked into indexable passages.

    Reference: ``DirectoryTextReader`` (``directory_reader.py:20-506``) —
    VFS listing + langchain loaders + ``RecursiveCharacterTextSplitter``.
    Spark mapping: ``spark.read.format("binaryFile")`` (distributed listing
    + content reads) → utf-8 decode + splitter inside ``mapInPandas``.
    ``external_id`` = 63-bit hash of (path, chunk index) — stable across
    re-ingests, like the reference's per-file ids.
    """

    def __init__(
        self,
        uri: str,
        glob: str = "*.txt",
        chunk_size: int = 1000,
        chunk_overlap: int = 100,
    ):
        self.uri = uri
        self.glob = glob
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap

    def read_objects(self, spark: SparkSession) -> DataFrame:
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", self.glob)
            .load(self.uri)
            .select("path", "content")
        )
        cs, ov = self.chunk_size, self.chunk_overlap

        def split(batches) -> Iterator:
            import hashlib

            import pandas as pd

            for pdf in batches:
                rows = []
                for path, content in zip(pdf["path"], pdf["content"]):
                    text = bytes(content).decode("utf-8", errors="replace")
                    for i, chunk in enumerate(_split_text(text, cs, ov)):
                        h = hashlib.md5(f"{path}#{i}".encode()).digest()
                        eid = int.from_bytes(h[:8], "big") >> 1  # 63-bit
                        rows.append((eid, chunk, path, i))
                yield pd.DataFrame(
                    rows, columns=[ID_COL, "text", "file_path", "chunk_index"]
                )

        return files.mapInPandas(
            split,
            schema=f"{ID_COL} long, text string, file_path string, chunk_index int",
        )

    def metadata_attributes(self) -> list[str]:
        return ["file_path", "chunk_index"]

    def payload_columns(self) -> list[str]:
        return ["text"]


class DirectoryImageReader(ObjectReader):
    """Image files as binary payloads + typed metadata, with NATIVE decode.

    Reference: ``DirectoryImageReader`` (``directory_reader.py:507-643``)
    decodes to RGB arrays with PIL.  Here the mainstream formats decode
    dependency-free — binary netpbm (P5/P6), PNG at every bit depth
    (stdlib zlib), JPEG incl. progressive, arithmetic-coded, and 12-bit
    (``objects/jpeg.py`` / ``jpeg_arith.py``), both WebP flavors incl.
    ALPH + animation (``objects/webp.py`` / ``objects/vp8.py``), and GIF
    incl. animation (``objects/gif.py``) — covering the default glob end
    to end; PIL remains an import-try fallback for the residual tail
    only (lossless/hierarchical JPEG processes and guard-tripped
    oversizes).  On a cluster WITH Pillow, ``decode_image(prefer=
    "system")`` flips the order: the C path first for mainstream
    formats, native as the no-deps fallback and differential ground
    truth.
    """

    def __init__(self, uri: str, glob: str = "*.{png,jpg,jpeg,gif}"):
        self.uri = uri
        self.glob = glob

    def read_objects(self, spark: SparkSession) -> DataFrame:
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", self.glob)
            .load(self.uri)
            .select("path", "content", "length")
        )
        return files.select(
            # logical shift: arithmetic >> would keep xxhash64's sign and
            # produce ids outside the documented [0, 2^63) domain
            (F.shiftrightunsigned(F.xxhash64("path"), 1)).alias(ID_COL),
            F.col("content").alias("image"),
            F.col("path").alias("file_path"),
            F.col("length").alias("n_bytes"),
        )

    @staticmethod
    def decode(image_bytes: bytes):
        """Decode to a pixel array.

        Magic-dispatched (:func:`..objects.codecs.decode_image`): binary
        netpbm (PGM/PPM), PNG, JPEG, GIF, and WebP decode NATIVELY
        (dependency-free); the exotic tail (animated webp,
        arithmetic-coded JPEG, oversized pure-Python decodes) falls back
        to PIL when installed (the reference's decoder,
        ``directory_reader.py:507-643``) and raises with that hint
        otherwise.
        """
        from tiledb_vector_search_spark.objects.codecs import decode_image

        return decode_image(image_bytes)

    def metadata_attributes(self) -> list[str]:
        return ["file_path", "n_bytes"]

    def payload_columns(self) -> list[str]:
        return ["image"]
