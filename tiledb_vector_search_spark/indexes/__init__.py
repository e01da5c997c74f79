from tiledb_vector_search_spark.indexes.base import Index, open_index
from tiledb_vector_search_spark.indexes.flat import FlatIndex
from tiledb_vector_search_spark.indexes.ivf_flat import IVFFlatIndex

__all__ = ["Index", "open_index", "FlatIndex", "IVFFlatIndex"]
