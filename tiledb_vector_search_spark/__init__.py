"""tiledb_vector_search_spark — a PySpark-native vector analytics engine.

A brand-new engine with the query and data-processing capabilities of
TileDB-Inc/TileDB-Vector-Search (reference at /root/reference, read-only),
re-expressed Spark-first: DataFrame/SQL logical plans, Catalyst physical
planning, partitioned Parquet storage, Arrow-vectorized pandas UDF kernels
where the built-in operators can't express the semantics (distance batch
kernels, PQ encode/decode).

Public surface (mirrors the reference's ``tiledb.vector_search`` package):

- :mod:`.indexes` — ``FlatIndex``, ``IVFFlatIndex``, ``IVFPQIndex``,
  ``VamanaIndex`` (reference:
  ``apis/python/src/tiledb/vector_search/{flat,ivf_flat,ivf_pq,vamana}_index.py``)
- :mod:`.sources` — FVEC/IVEC/BVEC/U8BIN/F32BIN/U64BIN file decoders,
  format autodetect, header metadata (reference ``ingestion.py:400-1075``)
- :mod:`.objects` — ObjectReader/ObjectEmbedding ABCs, directory readers,
  ``ObjectIndex`` with filtered over-fetch queries (reference
  ``object_api/object_index.py``)
- :mod:`.operators.knn` — the k-NN plan builders (brute force, IVF-routed)
- :mod:`.operators.dedup` — LLM-data-pipeline dedup (exact, minhash-LSH,
  simhash, n-gram jaccard, hyperplane-LSH embedding near-dup)
- :mod:`.functions` — distance/vector/text column functions
- :mod:`.streaming` — Structured Streaming upserts into the updates log,
  windowed rollups (SURVEY §2.12 mapping)
- :mod:`.storage` — index group storage (Hadoop FS portable), updates log,
  time travel (reference: ``index.py`` timestamp semantics)
"""

from tiledb_vector_search_spark.session import get_spark
from tiledb_vector_search_spark.indexes import (
    FlatIndex,
    IVFFlatIndex,
    IVFPQIndex,
    Index,
    VamanaIndex,
    open_index,
)
from tiledb_vector_search_spark.ingestion import ingest
from tiledb_vector_search_spark.storage import (
    ConcurrentWriterError,
    writer_lease,
)
from tiledb_vector_search_spark import utils
from tiledb_vector_search_spark.compat import (
    STORAGE_VERSION,
    Mode,
    array_to_matrix,
    ivf_index,
    ivf_index_tdb,
    ivf_query,
    ivf_query_ram,
    load_as_array,
    load_as_matrix,
    partition_ivf_index,
    query_vq_heap,
    query_vq_nth,
    storage_formats,
    validate_top_k,
)

# reference UX: ``tvs.open(uri)`` (``from .index import open``)
open = open_index  # noqa: A001 — intentional, mirrors the reference export

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Index",
    "FlatIndex",
    "IVFFlatIndex",
    "IVFPQIndex",
    "VamanaIndex",
    "open",
    "open_index",
    "ingest",
    "load_as_array",
    "load_as_matrix",
    "array_to_matrix",
    "query_vq_nth",
    "query_vq_heap",
    "ivf_index",
    "ivf_index_tdb",
    "ivf_query",
    "ivf_query_ram",
    "partition_ivf_index",
    "validate_top_k",
    "Mode",
    "ConcurrentWriterError",
    "writer_lease",
    "utils",
    "STORAGE_VERSION",
    "storage_formats",
    "__version__",
]
