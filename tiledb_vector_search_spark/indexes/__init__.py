from tiledb_vector_search_spark.indexes.base import Index, open_index
from tiledb_vector_search_spark.indexes.flat import FlatIndex
from tiledb_vector_search_spark.indexes.ivf_flat import IVFFlatIndex
from tiledb_vector_search_spark.indexes.ivf_pq import IVFPQIndex
from tiledb_vector_search_spark.indexes.vamana import VamanaIndex

__all__ = [
    "Index",
    "open_index",
    "FlatIndex",
    "IVFFlatIndex",
    "IVFPQIndex",
    "VamanaIndex",
]
