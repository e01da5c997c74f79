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
from tiledb_vector_search_spark.schemas import (
    ID_COL,
    VECTOR_COL,
    integral_id_col,
)
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
        vector_dtype: str = "float32",
        dimensions: int | None = None,
    ) -> "FlatIndex":
        """Create + ingest (reference ``ingest_flat``, ``ingestion.py:1582-1684``).

        One distributed write; no sampling/training stage.
        ``vector_dtype="uint8"|"int8"`` stores the vectors as a packed
        ``binary`` column (1 byte/element — the reference's native u8/i8
        dispatch, ``module.py:114-121``; bigann is u8), decoded to float
        only inside the query kernels.

        An EMPTY source is allowed — the create-then-stream pattern (the
        reference's ``create(uri, dimensions=...)`` without data) — but
        then ``dimensions`` must be given explicitly so query validation
        and streamed updates know the vector width.
        """
        from tiledb_vector_search_spark.functions.dtypes import (
            ensure_packed,
            is_byte_dtype,
            pack_vectors,
        )

        metric = DistanceMetric(metric)
        ts = timestamp if timestamp is not None else now_ms()
        if is_byte_dtype(vector_dtype):
            vectors = ensure_packed(
                source.select(
                    integral_id_col(source, id_col, "FlatIndex.ingest").alias(ID_COL),
                    F.col(vector_col).alias(VECTOR_COL),
                ),
                vector_dtype,
                VECTOR_COL,
            )
        else:
            vectors = source.select(
                integral_id_col(source, id_col, "FlatIndex.ingest").alias(ID_COL),
                F.col(vector_col).cast("array<float>").alias(VECTOR_COL),
            )
        from tiledb_vector_search_spark.indexes.base import count_and_dims

        n, dims = count_and_dims(vectors, check_unique_ids=True)
        if n == 0:
            if dimensions is None:
                raise ValueError(
                    "empty source: pass dimensions= so the index knows its "
                    "vector width (reference create() contract)"
                )
            dims = int(dimensions)
        elif dimensions is not None and dims != int(dimensions):
            # a declared width that disagrees with the data catches a
            # mis-typed binary payload (e.g. int16 bytes read as u8 give a
            # uniform 2x byte length the ragged check can't see)
            raise ValueError(
                f"dimensions={int(dimensions)} but the source's vectors are "
                f"{dims} elements wide ({dims} bytes/row for packed "
                f"{vector_dtype!r} at 1 byte/element) — for byte dtypes, "
                "check the source payload really is 1-byte integers"
            )
        storage = IndexStorage(spark, uri)
        from tiledb_vector_search_spark.indexes.base import (
            check_reingest_meta,
        )

        check_reingest_meta(
            storage, cls.index_type, metric, int(dims), vector_dtype
        )
        if not storage.exists():
            storage.init_meta(
                index_type=cls.index_type,
                metric=metric.value,
                dimensions=int(dims),
                vector_dtype=vector_dtype,
            )
        storage.write_base(vectors, ts, base_size=None)
        return cls(spark, uri)

    def _write_consolidated(self, vectors: DataFrame, ts: int, **kw: Any) -> None:
        from tiledb_vector_search_spark.functions.dtypes import (
            is_byte_dtype,
            pack_vectors,
        )

        # consolidation may arrive float-promoted (updates overlay); re-pack
        # so the snapshot keeps the declared storage dtype
        if is_byte_dtype(self.vector_dtype) and dict(vectors.dtypes).get(
            VECTOR_COL, ""
        ).startswith("array"):
            vectors = pack_vectors(vectors, self.vector_dtype, VECTOR_COL)
        self.storage.write_base(vectors, ts)

    # -- query ----------------------------------------------------------------

    def query(
        self,
        queries: DataFrame,
        k: int,
        strategy: str = "kernel",
        pad: bool = False,
        allowed_ids: DataFrame | None = None,
        excluded_ids: DataFrame | None = None,
        recall_target: float | None = None,
        **kw: Any,
    ) -> DataFrame:
        """Exact top-k: (query_id, external_id, distance, rank).


        ``recall_target`` is accepted for interface parity with the
        probe-routed types and is a no-op: a FLAT scan is exact, so
        every target ≤ 1.0 is already met at the only operating point.

        Reference drives ``query_vq_heap`` over the RAM-resident matrix
        (``flat_index.py:115-147``); here the updates overlay and scan are
        one lazy plan (see ``Index`` docstring).  ``pad=True`` null-pads
        short result sets to exactly k rows per query (the reference's
        sentinel-padding contract, ``index.py:346-350``).

        ``allowed_ids`` (a DataFrame with an ``external_id`` column)
        restricts the searchable set BEFORE scoring — the filtered-search
        pushdown path.  Exact top-k among the allowed set: no over-fetch
        factor to guess, no risk of fewer than k survivors (contrast the
        reference's ``fetch_k`` heuristic, ``object_index.py:451-453``).
        The semi-join is un-hinted so AQE broadcasts a small allowed set
        and shuffles a large one.

        ``excluded_ids`` (same shape) removes ids from the searchable
        set BEFORE top-k — the anti-join twin.  A post-hoc filter on the
        result would let excluded rows occupy top-k slots and push true
        neighbors below k (the streaming embedding screen's replay
        hazard); the pushdown keeps the result exact among the
        non-excluded set with no over-fetch heuristic.
        """
        from tiledb_vector_search_spark.functions.dtypes import (
            is_byte_dtype,
            unpack_vectors,
        )

        # kernel strategy collects the query batch anyway — the kernel
        # validates the collected rows (expected_dims) so the separate
        # validation aggregate job is skipped (r11 opt); other
        # strategies keep the distributed data check
        self._validate_queries(
            queries, k, kw, data_check=(strategy != "kernel")
        )
        if recall_target is not None and recall_target > 1.0:
            # match the probe-routed types' ceiling contract
            raise ValueError(
                f"recall_target {recall_target} exceeds 1.0 — no index "
                "can clear it (FLAT is exact: any target <= 1.0 is met)"
            )
        vecs = self.effective_vectors()
        if allowed_ids is not None:
            vecs = vecs.join(
                allowed_ids.select(
                    integral_id_col(
                        allowed_ids, ID_COL, "FlatIndex.query allowed_ids"
                    ).alias(ID_COL)
                ),
                ID_COL,
                "left_semi",
            )
        if excluded_ids is not None:
            vecs = vecs.join(
                excluded_ids.select(
                    integral_id_col(
                        excluded_ids, ID_COL, "FlatIndex.query excluded_ids"
                    ).alias(ID_COL)
                ),
                ID_COL,
                "left_anti",
            )
        # the effective set is float-typed when updates promoted it; packed
        # binary only on the no-updates fast path
        stored_is_binary = dict(vecs.dtypes)[VECTOR_COL] == "binary"
        if stored_is_binary and strategy == "kernel":
            res = knn_bruteforce(
                vecs, queries, k, self.metric, strategy="kernel",
                vector_dtype=self.vector_dtype,
                expected_dims=self.dimensions,
            )
        else:
            if stored_is_binary:
                # expr path needs an array column — explicit promotion
                vecs = unpack_vectors(vecs, self.vector_dtype, VECTOR_COL)
            res = knn_bruteforce(
                vecs, queries, k, self.metric, strategy=strategy,
                **(
                    {"expected_dims": self.dimensions}
                    if strategy == "kernel"
                    else {}
                ),
            )
        if pad:
            from tiledb_vector_search_spark.operators.topk import pad_to_k

            res = pad_to_k(res, queries, k)
        return res
