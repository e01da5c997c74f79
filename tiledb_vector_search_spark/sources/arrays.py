"""Array-shaped sources: sparse-COO and partitioned-blob vector layouts.

Reference (SURVEY §2.1): TILEDB_SPARSE_ARRAY scan densifies COO triples via
scipy ``coo_matrix`` (``ingestion.py:950-970``); TILEDB_PARTITIONED_ARRAY
scan unpacks var-length per-partition blobs using a ``vectors_shape`` attr
(``ingestion.py:972-1007``).  Both are pure Catalyst here: a group-by
map-reassembly for COO, a ``posexplode`` + ``arrays_zip`` for blobs — no
Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.schemas import ID_COL, VECTOR_COL


def sparse_coo_to_vectors(
    coo: DataFrame,
    dims: int,
    id_col: str = ID_COL,
    idx_col: str = "idx",
    val_col: str = "val",
) -> DataFrame:
    """(id, idx, val) COO triples → dense ``(external_id, vector)``.

    Missing positions fill with 0.0 and DUPLICATE coordinates SUM —
    both scipy ``coo_matrix`` densify semantics (reference
    ``ingestion.py:950-970``; real single-cell/SOMA COO sources carry
    duplicate coordinates legally).  The (id, idx) pre-aggregate is
    what makes duplicates safe: without it ``map_from_entries`` throws
    'Duplicate map key' under Spark's default EXCEPTION dedup policy.
    Both aggregations are hash-partitioned with map-side combine; the
    dense array assembles from a position→value map, JVM-side.
    """
    # scipy coo_matrix RAISES on out-of-bounds coordinates; silently
    # skipping them here (positions outside [0, dims) are simply never
    # read by the transform below) would hide real source corruption.
    # The guard is inline — zero cost on valid rows, no extra job.
    checked_idx = F.when(
        (F.col(idx_col) < 0) | (F.col(idx_col) >= dims),
        F.raise_error(
            F.concat(
                F.lit(
                    f"sparse_coo_to_vectors: {idx_col} out of range "
                    f"[0, {dims}): "
                ),
                F.col(idx_col).cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.col(idx_col).cast("int"))
    summed = coo.groupBy(
        F.col(id_col).alias(ID_COL), checked_idx.alias("__i")
    ).agg(F.sum(F.col(val_col)).alias("__v"))
    entries = summed.groupBy(ID_COL).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__i", "__v"))
        ).alias("__m")
    )
    return entries.select(
        ID_COL,
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda i: F.coalesce(
                F.element_at("__m", i.cast("int")), F.lit(0.0)
            ).cast("double"),
        ).alias(VECTOR_COL),
    )


def partitioned_blobs_to_vectors(
    blobs: DataFrame,
    ids_col: str = "external_ids",
    vectors_col: str = "vectors",
) -> DataFrame:
    """Var-length partition blobs → ``(external_id, vector)`` rows.

    Input rows carry parallel arrays (``external_ids: array<long>``,
    ``vectors: array<array<float>>``) — the reference's partitioned object
    array attributes (``object_index.py:704-729``).  ``arrays_zip`` +
    ``explode`` flattens; the partition bookkeeping (``vectors_shape``)
    disappears because array lengths are self-describing.
    """
    zipped = blobs.select(
        F.explode(F.arrays_zip(F.col(ids_col), F.col(vectors_col))).alias("z")
    )
    return zipped.select(
        F.col(f"z.{ids_col}").alias(ID_COL),
        F.col(f"z.{vectors_col}").alias(VECTOR_COL),
    )
