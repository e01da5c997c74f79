from tiledb_vector_search_spark.sql.tvf import (
    AnnSearchUDTF,
    register_ann_search,
    search_index_files,
)

__all__ = ["AnnSearchUDTF", "register_ann_search", "search_index_files"]
