from tiledb_vector_search_spark.sql.functions import (
    SQL_FUNCTIONS,
    register_sql_functions,
)
from tiledb_vector_search_spark.sql.tvf import (
    AnnSearchUDTF,
    register_ann_search,
    search_index_files,
)

__all__ = [
    "AnnSearchUDTF",
    "SQL_FUNCTIONS",
    "register_ann_search",
    "register_sql_functions",
    "search_index_files",
]
