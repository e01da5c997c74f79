"""FLAT index: exhaustive exact search over a Parquet snapshot.

Reference: ``apis/python/src/tiledb/vector_search/flat_index.py`` (create/
query) + the C++ brute-force kernels ``detail/flat/vq.h:62-163``.  Storage
is a single unpartitioned snapshot (the reference's ``shuffled_vectors`` /
``shuffled_vector_ids`` pair collapses to one (id, vector) table).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.distance import DistanceMetric
from tiledb_vector_search_spark.indexes.base import Index
from tiledb_vector_search_spark.operators.knn import knn_bruteforce
from tiledb_vector_search_spark.schemas import ID_COL, VECTOR_COL
from tiledb_vector_search_spark.storage import IndexStorage, now_ms


class FlatIndex(Index):
    index_type = "FLAT"

    # -- build ----------------------------------------------------------------

    @classmethod
    def ingest(
        cls,
        spark: SparkSession,
        uri: str,
        source: DataFrame,
        metric: DistanceMetric | str = DistanceMetric.SUM_OF_SQUARES,
        timestamp: int | None = None,
        id_col: str = ID_COL,
        vector_col: str = VECTOR_COL,
    ) -> "FlatIndex":
        """Create + ingest (reference ``ingest_flat``, ``ingestion.py:1582-1684``).

        One distributed write; no sampling/training stage.
        """
        metric = DistanceMetric(metric)
        ts = timestamp if timestamp is not None else now_ms()
        vectors = source.select(
            F.col(id_col).cast("long").alias(ID_COL),
            F.col(vector_col).cast("array<float>").alias(VECTOR_COL),
        )
        from tiledb_vector_search_spark.indexes.base import count_and_dims

        _, dims = count_and_dims(vectors)
        storage = IndexStorage(spark, uri)
        if not storage.exists():
            storage.init_meta(
                index_type=cls.index_type,
                metric=metric.value,
                dimensions=int(dims),
            )
        storage.write_base(vectors, ts, base_size=None)
        return cls(spark, uri)

    def _write_consolidated(self, vectors: DataFrame, ts: int, **kw: Any) -> None:
        self.storage.write_base(vectors, ts)

    # -- query ----------------------------------------------------------------

    def query(
        self,
        queries: DataFrame,
        k: int,
        strategy: str = "kernel",
        pad: bool = False,
        **kw: Any,
    ) -> DataFrame:
        """Exact top-k: (query_id, external_id, distance, rank).

        Reference drives ``query_vq_heap`` over the RAM-resident matrix
        (``flat_index.py:115-147``); here the updates overlay and scan are
        one lazy plan (see ``Index`` docstring).  ``pad=True`` null-pads
        short result sets to exactly k rows per query (the reference's
        sentinel-padding contract, ``index.py:346-350``).
        """
        self._validate_queries(queries)
        res = knn_bruteforce(
            self.effective_vectors(), queries, k, self.metric, strategy=strategy
        )
        if pad:
            from tiledb_vector_search_spark.operators.topk import pad_to_k

            res = pad_to_k(res, queries, k)
        return res
