from tiledb_vector_search_spark.functions.distance import (
    DistanceMetric,
    distance_expr,
    cosine_distance,
    cosine_similarity,
    inner_product,
    l2_distance,
    sum_of_squares,
    normalize_expr,
)

__all__ = [
    "DistanceMetric",
    "distance_expr",
    "cosine_distance",
    "cosine_similarity",
    "inner_product",
    "l2_distance",
    "sum_of_squares",
    "normalize_expr",
]
