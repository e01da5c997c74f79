from tiledb_vector_search_spark.sources.arrays import (
    partitioned_blobs_to_vectors,
    sparse_coo_to_vectors,
)
from tiledb_vector_search_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from tiledb_vector_search_spark.sources.vecs import (
    autodetect_source_type,
    read_external_ids,
    read_source_metadata,
    read_vectors,
    write_bvecs,
    write_f32bin,
    write_fvecs,
    write_ivecs,
    write_u8bin,
    write_u64bin,
)

__all__ = [
    "sparse_coo_to_vectors",
    "partitioned_blobs_to_vectors",
    "autodetect_source_type",
    "read_bucketed",
    "write_bucketed",
    "read_external_ids",
    "read_source_metadata",
    "read_vectors",
    "write_bvecs",
    "write_f32bin",
    "write_fvecs",
    "write_ivecs",
    "write_u8bin",
    "write_u64bin",
]
