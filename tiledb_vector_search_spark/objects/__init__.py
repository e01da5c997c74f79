"""Object → embedding → vector-index pipeline (reference §2.11 surface).

Reference: ``apis/python/src/tiledb/vector_search/object_api/object_index.py``
(1044 LoC), ``object_readers/`` (ABC + directory readers),
``embeddings/object_embedding.py`` (ABC + model impls).

Spark-first re-expression: readers ARE DataFrame sources (an
``ObjectPartition`` is a Spark input split; the reference's hand-rolled
partition bookkeeping disappears), embeddings are Arrow-batched
``mapInPandas`` kernels with per-executor model loading, and the
ObjectIndex query is one lazy plan: embed → over-fetch kNN → metadata
filter → re-rank → object materialization semi-join.
"""

from tiledb_vector_search_spark.objects.domain_readers import (
    Array1DReader,
    BioImageDirectoryReader,
    SomaAnnDataReader,
)
from tiledb_vector_search_spark.objects.embeddings import (
    BytesHistogramEmbedding,
    HashingTextEmbedding,
    HuggingFaceAutoImageEmbedding,
    IdentityEmbedding,
    LangChainEmbedding,
    LumaGridEmbedding,
    ObjectEmbedding,
    RandomEmbedding,
    SentenceTransformersEmbedding,
)
from tiledb_vector_search_spark.objects.embeddings_ingestion import (
    ingest_embeddings_with_driver,
)
from tiledb_vector_search_spark.objects.object_index import (
    ObjectIndex,
    create,
)
from tiledb_vector_search_spark.objects.readers import (
    DataFrameObjectReader,
    DirectoryImageReader,
    DirectoryTextReader,
    ObjectReader,
)

__all__ = [
    "ObjectReader",
    "DataFrameObjectReader",
    "DirectoryTextReader",
    "DirectoryImageReader",
    "Array1DReader",
    "SomaAnnDataReader",
    "BioImageDirectoryReader",
    "ObjectEmbedding",
    "HashingTextEmbedding",
    "BytesHistogramEmbedding",
    "IdentityEmbedding",
    "LumaGridEmbedding",
    "RandomEmbedding",
    "SentenceTransformersEmbedding",
    "LangChainEmbedding",
    "HuggingFaceAutoImageEmbedding",
    "ObjectIndex",
    "create",
    "ingest_embeddings_with_driver",
]
