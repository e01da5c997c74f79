"""Domain object readers: 1-D vector arrays, single-cell AnnData/SOMA,
bio-image directories.

Reference: ``object_readers/tiledb_1d_array_reader.py`` (134 LoC),
``object_readers/soma_reader.py`` (157 LoC),
``object_readers/bioimage_reader.py`` (123 LoC).

Environment note: the domain decode libraries (``tiledbsoma`` / ``anndata``
/ ``tiledb.bioimg`` / PIL) are NOT installed here.  Per the build contract,
the decode steps are clearly-marked stubs while the Spark-side plumbing —
schemas, partition planning, pushed-down slicing, densification — is real
and tested against the equivalent open layouts (parquet COO for SOMA's
sparse X matrix, binaryFile listings for image pyramids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiledb_vector_search_spark.objects.readers import ObjectReader
from tiledb_vector_search_spark.schemas import (
    ID_COL,
    VECTOR_COL,
    integral_id_col,
)
from tiledb_vector_search_spark.sources.arrays import sparse_coo_to_vectors


class Array1DReader(ObjectReader):
    """A slice of a 1-D dense vector array as objects.

    Reference ``TileDB1DArrayReader``: a dense 1-D TileDB array whose cells
    are vectors, read by subarray ``[start_offset, end_offset)``.  Spark
    mapping: a parquet dataset of ``(id, vector)`` rows; the offset slice
    becomes a range predicate that Catalyst pushes into the parquet scan
    (min/max row-group pruning — the columnar analogue of a dense-array
    subarray read), so an end-offset slice of a 100 TB corpus reads only
    the covering row groups.
    """

    def __init__(
        self,
        uri: str,
        id_col: str = ID_COL,
        vector_col: str = VECTOR_COL,
        start_offset: int | None = None,
        end_offset: int | None = None,
    ):
        self.uri = uri
        self.id_col = id_col
        self.vector_col = vector_col
        self.start_offset = start_offset
        self.end_offset = end_offset

    def read_objects(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.uri)
        if self.start_offset is not None:
            df = df.where(F.col(self.id_col) >= F.lit(int(self.start_offset)))
        if self.end_offset is not None:
            df = df.where(F.col(self.id_col) < F.lit(int(self.end_offset)))
        return df.select(
            integral_id_col(
                df, self.id_col, type(self).__name__
            ).alias(ID_COL),
            F.col(self.vector_col).cast("array<float>").alias(VECTOR_COL),
        )

    def payload_columns(self) -> list[str]:
        return [VECTOR_COL]


class SomaAnnDataReader(ObjectReader):
    """Single-cell expression matrix → (cell, expression-vector) objects.

    Reference ``SomaAnnDataReader`` (``soma_reader.py``) slices the sparse
    ``X`` matrix of a SOMA experiment via ``tiledbsoma`` and densifies each
    cell's gene-expression row.  ``tiledbsoma``/``anndata`` are not
    installed in this environment (see :meth:`from_soma_experiment`), so
    this reader runs against the same physical shape in an open format:
    ``X`` as parquet COO triples ``(cell, gene, value)`` — which is exactly
    how SOMA stores X — densified with pure-Catalyst
    :func:`sparse_coo_to_vectors` (one shuffle on the cell id).  ``obs``
    (per-cell annotations) joins on as filterable metadata.
    """

    def __init__(
        self,
        x_uri: str,
        n_vars: int,
        cell_col: str = "cell_id",
        gene_col: str = "gene_idx",
        value_col: str = "value",
        obs_uri: str | None = None,
        metadata_cols: list[str] | None = None,
    ):
        self.x_uri = x_uri
        self.n_vars = int(n_vars)
        self.cell_col = cell_col
        self.gene_col = gene_col
        self.value_col = value_col
        self.obs_uri = obs_uri
        self._metadata = metadata_cols or []

    @classmethod
    def from_soma_experiment(cls, uri: str, **kw) -> "SomaAnnDataReader":
        """Open a SOMA experiment directly — STUB: requires ``tiledbsoma``,
        which is not available in this environment.  Export X to COO
        parquet and use the main constructor instead."""
        try:
            import tiledbsoma  # noqa: F401
        except ImportError as e:  # pragma: no cover - env has no tiledbsoma
            raise NotImplementedError(
                "tiledbsoma is not installed; export the experiment's X "
                "matrix to COO parquet and construct SomaAnnDataReader "
                "directly"
            ) from e
        raise NotImplementedError("direct SOMA opening not wired yet")

    def read_objects(self, spark: SparkSession) -> DataFrame:
        coo = spark.read.parquet(self.x_uri)
        cells = sparse_coo_to_vectors(
            coo,
            self.n_vars,
            id_col=self.cell_col,
            idx_col=self.gene_col,
            val_col=self.value_col,
        ).select(
            ID_COL, F.col(VECTOR_COL).cast("array<float>").alias(VECTOR_COL)
        )
        if self.obs_uri is not None:
            obs_raw = spark.read.parquet(self.obs_uri)
            obs = obs_raw.select(
                integral_id_col(
                    obs_raw, self.cell_col, type(self).__name__
                ).alias(ID_COL),
                *self._metadata,
            )
            cells = cells.join(obs, ID_COL, "left")
        return cells

    def metadata_attributes(self) -> list[str]:
        return list(self._metadata)

    def payload_columns(self) -> list[str]:
        return [VECTOR_COL]


class BioImageDirectoryReader(ObjectReader):
    """Bio-image files (OME-TIFF pyramids etc.) as binary payloads with
    per-resolution-level rows.

    Reference ``BioImageDirectoryReader`` (``bioimage_reader.py``) decodes
    multi-resolution bio-images via ``tiledb.bioimg`` and emits one object
    per (image, level).  No bio-image codec exists in this environment:
    :meth:`decode_level` is a clearly-marked stub, while the listing
    (distributed ``binaryFile`` scan), the per-level row explosion, the
    stable 63-bit ids, and the schema are real — pair with
    ``BytesHistogramEmbedding`` for a deterministic byte-level feature
    stand-in.

    Payload amplification (known, stub-bound): each of the ``levels``
    rows carries the FULL file bytes — without a bio-image codec there
    is no way to slice one pyramid level's bytes, and the reference's
    per-level objects are real level slices.  The cost is transient
    task memory on the embed path only (vectors shuffle, payload bytes
    never do); a real ``decode_level`` integration should emit level
    slices here and remove the ×levels duplication.
    """

    def __init__(self, uri: str, glob: str = "*.tiff", levels: int = 1):
        if levels < 1:
            raise ValueError("levels must be >= 1")
        self.uri = uri
        self.glob = glob
        self.levels = int(levels)

    def read_objects(self, spark: SparkSession) -> DataFrame:
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", self.glob)
            .load(self.uri)
            .select("path", "content", "length")
        )
        per_level = files.select(
            "path",
            "content",
            "length",
            F.explode(F.sequence(F.lit(0), F.lit(self.levels - 1))).alias("level"),
        )
        return per_level.select(
            F.shiftrightunsigned(
                F.xxhash64("path", "level"), 1
            ).alias(ID_COL),
            F.col("content").alias("image"),
            F.col("path").alias("file_path"),
            F.col("length").alias("n_bytes"),
            "level",
        )

    @staticmethod
    def decode_level(image_bytes: bytes, level: int):
        """Decode one resolution level to an RGB array — STUB: bio-image
        codecs (``tiledb.bioimg``/PIL) are not installed in this
        environment.  Wire a real decoder here when they are."""
        raise NotImplementedError(
            "bio-image decoding requires tiledb.bioimg/PIL, not available "
            "in this environment; use BytesHistogramEmbedding for "
            "byte-level features"
        )

    def metadata_attributes(self) -> list[str]:
        return ["file_path", "n_bytes", "level"]

    def payload_columns(self) -> list[str]:
        return ["image"]
