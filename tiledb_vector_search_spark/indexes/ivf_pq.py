"""IVF_PQ index: coarse IVF partitioning + product-quantized codes.

Reference: ``apis/python/src/tiledb/vector_search/ivf_pq_index.py`` (API,
``k_factor`` re-rank at ``:121-163``) and ``src/include/index/ivf_pq_index.h``
(training ``:535-595``, asymmetric distance ``:597-690``).  The reference
chunks each raw vector into ``num_subspaces`` pieces and stores, per piece,
the index of the nearest of 256 per-subspace "cluster centroids"; queries
score codes with per-query lookup tables (asymmetric distance), optionally
re-ranking ``k_factor·k`` coarse candidates against the original vectors.

Spark-first physical design:

- codes live in a ``binary`` column (``num_subspaces`` uint8 bytes per row)
  beside the original ``vector`` column in the same partitioned Parquet
  snapshot.  Parquet is columnar, so the coarse scan reads ONLY
  (external_id, code) — for 64-dim float32 vectors that is a 32× IO
  reduction, which is the entire point of PQ at 100 TB — while the re-rank
  stage reads (external_id, vector) just for the candidate ids.
- the ADC lookup tables (nq × num_subspaces × 256 float64) are built on the
  driver from the broadcast codebooks and shipped with the routing map to a
  ``mapInPandas`` kernel; scoring is a vectorized numpy gather+sum.
- per-batch partial top-(k·k_factor) with the deterministic (distance, id)
  tie-break, final window merge, then an optional exact re-rank join — the
  same two-stage DataFrame shape as the reference's
  ``preload_k_factor_vectors`` path.

Metric support: SUM_OF_SQUARES / L2 only (reference ``ivf_pq_index.py``
support matrix; PQ tables are squared-distance sums).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.distance import (
    DistanceMetric,
    distance_expr,
)
from tiledb_vector_search_spark.indexes.base import Index, count_and_dims
from tiledb_vector_search_spark.ml.kmeans import (
    CENTRALIZED_K_MAX,
    CENTRALIZED_SAMPLE_MAX,
    default_partitions,
    default_training_sample_size,
    kmeans_numpy,
    train_centroids_ml,
)
from tiledb_vector_search_spark.operators.knn import (
    knn_bruteforce_expr,
    partial_topk_idx,
)
from tiledb_vector_search_spark.operators.routing import route_queries
from tiledb_vector_search_spark.operators.topk import topk_window
from tiledb_vector_search_spark.schemas import (
    DISTANCE_COL,
    ID_COL,
    PARTITION_COL,
    QUERY_ID_COL,
    VECTOR_COL,
    integral_id_col,
)
from tiledb_vector_search_spark.storage import (
    IndexStorage,
    cached_snapshot_artifact,
    now_ms,
)
from tiledb_vector_search_spark.session import small_df
from tiledb_vector_search_spark.driver_io import write_small_parquet

_SUPPORTED = {DistanceMetric.SUM_OF_SQUARES, DistanceMetric.L2}

CODE_COL = "code"
PQ_CODEBOOK_AUX = "pq_codebooks"
PQ_BITS = 8  # 256 codes per subspace (reference ivf_pq_index.h:212-217)
PQ_TRAIN_MAX = 100_000
# partial-probe overlay (shared machinery: indexes/overlay.py) — the
# bridge rows store RAW vectors and are scored EXACTLY, so for IVF_PQ
# the overlay sidesteps BOTH loss sources at cheap nprobe: routing loss
# (the member's home cell wasn't probed) and ADC quantization loss
OVERLAY_AUX = "pq_overlay"
OVERLAY_PID = -1
DEFAULT_OVERLAY_MAX = 8192


def _encode_kernel(df: DataFrame, codebooks: np.ndarray, vector_col: str) -> DataFrame:
    """Append a ``code`` binary column: nearest codebook entry per subspace.

    Reference ``ivf_pq_index.h:559-595`` (flat_encode over subspaces).
    ``codebooks``: (num_subspaces, n_codes, sub_dim) float64.
    """
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema += f", {CODE_COL} binary"

    def encode(batches):
        cb = bc.value
        m, n_codes, sub_dim = cb.shape
        cb_sq = np.sum(cb * cb, axis=2)  # (m, n_codes)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vector_col]), dtype=np.float64)
            n = x.shape[0]
            codes = np.empty((n, m), dtype=np.uint8)
            for j in range(m):
                sub = x[:, j * sub_dim : (j + 1) * sub_dim]
                # ||sub - c||² argmin via the BLAS identity (x² terms constant)
                d = cb_sq[j][None, :] - 2.0 * (sub @ cb[j].T)
                codes[:, j] = np.argmin(d, axis=1)
            out = pdf.copy()
            out[CODE_COL] = [codes[i].tobytes() for i in range(n)]
            yield out

    return df.mapInPandas(encode, schema=schema)


def assign_and_encode_kernel(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vector_col: str,
    partition_col: str,
    vector_dtype: str = "float32",
    residual: bool = False,
    with_margins: bool = False,
) -> DataFrame:
    """ONE Arrow pass appending both ``partition_id`` and ``code``.

    Fusing coarse assignment and PQ encoding halves the Python-worker
    round-trips over the full vector column — at 100 TB that is one scan of
    the data instead of two.  ``with_margins`` additionally emits
    ``__second``/``__margin`` from the same coarse distance matrix (the
    overlay selection's boundary signal — threaded through so the
    overlay build drops its own full-corpus margin scan).

    ``residual=True`` PQ-encodes ``x − centroid[assign]`` instead of the
    raw vector (the IVFADC formulation, Jégou et al. 2011): residuals
    have far less variance than the vectors themselves, so the same
    8-bit-per-subspace budget quantizes much finer and ADC ranking
    fidelity — hence recall at a fixed k_factor — rises sharply.  The
    flag is persisted in index meta; raw encoding remains readable for
    indexes written before storage spark-0.3.
    """
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((centroids, codebooks))
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema += f", {partition_col} int, {CODE_COL} binary"
    if with_margins:
        if centroids.shape[0] < 2:
            raise ValueError("with_margins needs >= 2 centroids")
        schema += ", __second int, __margin double"

    def run(batches):
        from tiledb_vector_search_spark.functions.dtypes import decode_matrix

        cents, cb = bc.value
        c_sq = np.sum(cents * cents, axis=1)
        m, n_codes, sub_dim = cb.shape
        cb_sq = np.sum(cb * cb, axis=2)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = decode_matrix(pdf[vector_col], vector_dtype)
            n = x.shape[0]
            d = c_sq[None, :] - 2.0 * (x @ cents.T)
            assign = np.argmin(d, axis=1).astype(np.int32)
            enc = x - cents[assign] if residual else x
            codes = np.empty((n, m), dtype=np.uint8)
            for j in range(m):
                sub = enc[:, j * sub_dim : (j + 1) * sub_dim]
                dj = cb_sq[j][None, :] - 2.0 * (sub @ cb[j].T)
                codes[:, j] = np.argmin(dj, axis=1)
            out = pdf.copy()
            out[partition_col] = assign
            out[CODE_COL] = [codes[i].tobytes() for i in range(n)]
            if with_margins:
                from tiledb_vector_search_spark.ml.kmeans import (
                    second_and_margin,
                )

                second, margin = second_and_margin(d)
                out["__second"] = second
                out["__margin"] = margin
            yield out

    return df.mapInPandas(run, schema=schema)


def default_num_subspaces(dims: int) -> int:
    """Largest divisor of ``dims`` that is ≤ 16 — the reference's default
    subspace count (``ivf_pq_index.h:309``), relaxed to keep the
    dims-divisibility contract for dimensions 16 doesn't divide.  More
    subspaces = finer quantization (sub_dim shrinks), directly buying
    ADC ranking fidelity at 1 byte/subspace/vector."""
    for m in range(min(16, dims), 0, -1):
        if dims % m == 0:
            return m
    return 1


def _coarse_residuals(sample: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """sample − nearest-centroid (the PQ training input for residual
    encoding); one BLAS argmin over the ≤100k sample — driver micro-task."""
    d = np.sum(centroids * centroids, axis=1)[None, :] - 2.0 * (
        sample @ centroids.T
    )
    return sample - centroids[np.argmin(d, axis=1)]


def train_pq_codebooks(
    sample: np.ndarray, num_subspaces: int, n_codes: int = 256, seed: int = 42
) -> np.ndarray:
    """Per-subspace k-means codebooks on a training sample.

    Reference ``sub_kmeans_random_init`` driver (``ivf_pq_index.h:559-607``,
    ``kmeans.h:423-615``): the sample is small (≤100k) and each subproblem is
    256 centroids over ``dims/num_subspaces`` dims — a driver-side
    numpy micro-task, as the reference itself judges.
    Returns (num_subspaces, n_codes, sub_dim); padded with zeros if the
    sample has fewer than ``n_codes`` distinct points.
    """
    from concurrent.futures import ThreadPoolExecutor

    dims = sample.shape[1]
    sub_dim = dims // num_subspaces
    out = np.zeros((num_subspaces, n_codes, sub_dim), dtype=np.float64)

    def _train(j: int) -> np.ndarray:
        sub = sample[:, j * sub_dim : (j + 1) * sub_dim]
        return kmeans_numpy(sub, n_codes, seed=seed + j)

    # subproblems are independent and per-subspace seeded (deterministic
    # regardless of completion order); BLAS releases the GIL, so threads
    # give real parallelism on the driver
    import os

    workers = min(num_subspaces, os.cpu_count() or 8)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        books = list(ex.map(_train, range(num_subspaces)))
    for j, cb in enumerate(books):
        out[j, : cb.shape[0]] = cb
        if cb.shape[0] < n_codes:
            # duplicate the last centroid so unused codes never win argmin
            out[j, cb.shape[0] :] = cb[-1]
    return out


class IVFPQIndex(Index):
    index_type = "IVF_PQ"


    def _describe_extra(self):
        return {
            "partitions": self.partitions,
            "num_subspaces": self.num_subspaces,
            "has_overlay": self.has_overlay,
            **self._partition_balance(PARTITION_COL),
        }

    # -- build ----------------------------------------------------------------

    @classmethod
    def ingest(
        cls,
        spark: SparkSession,
        uri: str,
        source: DataFrame,
        metric: DistanceMetric | str = DistanceMetric.SUM_OF_SQUARES,
        partitions: int | None = None,
        num_subspaces: int | None = None,
        training_sample_size: int | None = None,
        training_sampling_policy: str = "random",
        training_source: DataFrame | None = None,
        copy_centroids_from: np.ndarray | None = None,
        timestamp: int | None = None,
        id_col: str = ID_COL,
        vector_col: str = VECTOR_COL,
        seed: int = 42,
        vector_dtype: str = "float32",
        overlay: bool = False,
        overlay_max: int = DEFAULT_OVERLAY_MAX,
        overlay_audit_nprobe: int | None = None,
        overlay_boost_max: int = 0,
        recall_curve: bool = False,
    ) -> "IVFPQIndex":
        if not overlay and (
            overlay_max != DEFAULT_OVERLAY_MAX
            or overlay_audit_nprobe is not None
            or overlay_boost_max != 0
        ):
            raise ValueError(
                "overlay_max/overlay_audit_nprobe/overlay_boost_max were "
                "set but overlay=False — they would be silently ignored; "
                "pass overlay=True to build the bridge set"
            )
        from tiledb_vector_search_spark.functions.dtypes import (
            decode_matrix,
            ensure_packed,
            is_byte_dtype,
            pack_vectors,
        )

        metric = DistanceMetric(metric)
        if metric not in _SUPPORTED:
            # reference support matrix: ivf_pq_index.py:212-218
            raise ValueError(f"IVF_PQ does not support metric {metric.value}")
        ts = timestamp if timestamp is not None else now_ms()

        if is_byte_dtype(vector_dtype):
            vectors = ensure_packed(
                source.select(
                    integral_id_col(source, id_col, "IVFPQIndex.ingest").alias(ID_COL),
                    F.col(vector_col).alias(VECTOR_COL),
                ),
                vector_dtype,
                VECTOR_COL,
            )
        else:
            vectors = source.select(
                integral_id_col(source, id_col, "IVFPQIndex.ingest").alias(ID_COL),
                F.col(vector_col).cast("array<float>").alias(VECTOR_COL),
            )
        n, dims = count_and_dims(vectors, check_unique_ids=True)
        if n == 0:
            raise ValueError(
                "cannot train an IVF_PQ index on an empty source "
                "(k-means and PQ codebooks need data); ingest a FLAT index "
                "instead and stream updates into it"
            )
        # resolve storage BEFORE choosing num_subspaces: the code layout is
        # an index-wide invariant, so re-ingesting onto an existing index
        # must keep its subspace count — resolving the (possibly newer)
        # default first would silently flip the layout while meta still
        # says the old count
        storage = IndexStorage(spark, uri)
        from tiledb_vector_search_spark.indexes.base import (
            check_reingest_meta,
        )

        check_reingest_meta(
            storage, cls.index_type, metric, int(dims), vector_dtype
        )
        existing_meta = storage.read_meta() if storage.exists() else None
        if num_subspaces is None:
            if existing_meta is not None and existing_meta.get("num_subspaces"):
                num_subspaces = int(existing_meta["num_subspaces"])
            else:
                # reference default: 16 subspaces (ivf_pq_index.h:309),
                # clipped to a divisor of dims so the chunking contract
                # always holds
                num_subspaces = default_num_subspaces(dims)
        elif (
            existing_meta is not None
            and existing_meta.get("num_subspaces")
            and num_subspaces != int(existing_meta["num_subspaces"])
        ):
            raise ValueError(
                f"index at {uri} was built with num_subspaces="
                f"{existing_meta['num_subspaces']}; re-ingesting with "
                f"num_subspaces={num_subspaces} would change the code "
                "layout index-wide — pass the original count or use a "
                "new uri"
            )
        if dims % num_subspaces != 0:
            # reference validation: ivf_pq_index.py:204-210
            raise ValueError(
                f"dimensions ({dims}) must be divisible by "
                f"num_subspaces ({num_subspaces})"
            )
        k = partitions or default_partitions(n)

        # ONE bounded sample scan serves both trainings: PQ codebooks always,
        # and the coarse centroids whenever the centralized path applies
        # (sample caps are equal, so the PQ sample is a superset) — saving a
        # second full-corpus sampling scan, which is real IO at 100 TB.
        # ordered take: a bare limit() samples whichever tasks finish
        # first and the codebooks/centroids (so recall) drift run to run;
        # orderBy+limit runs as distributed TakeOrdered.  Hash-ordered,
        # not id-ordered — see train_centroids_ml: an id order would
        # exclude the highest-id tail of the oversampled pool from
        # training on append-ordered corpora.
        if training_source is not None:
            # training_input_vectors / training_source_uri parity
            # (reference ``ingestion.py:64-150``): the provided vectors
            # train BOTH the coarse centroids and the PQ codebooks — one
            # curated training read, decoupled from the corpus scan.
            # Refusals match IVF_FLAT (and the reference refuses the
            # training_sample_size pair).
            if copy_centroids_from is not None:
                raise ValueError(
                    "pass either training_source (train on these "
                    "vectors) or copy_centroids_from (skip coarse "
                    "training), not both"
                )
            if training_sample_size is not None:
                raise ValueError(
                    "training_sample_size sizes the CORPUS sample; with "
                    "training_source the provided vectors ARE the "
                    "training set — pre-sample it upstream instead "
                    "(the reference refuses the pair too, "
                    "ingestion.py:145-150)"
                )
            if training_sampling_policy != "random":
                raise ValueError(
                    "training_sampling_policy governs the CORPUS sample; "
                    "with training_source no corpus sampling happens — "
                    "order the provided frame upstream instead"
                )
            tvecs = training_source.select(
                F.col(vector_col).cast("array<float>").alias(VECTOR_COL)
            )
            # (no cosine branch: IVF_PQ refuses COSINE outright above)
            # bounded deterministic take (hash of the vector — no id
            # required); a training set larger than PQ_TRAIN_MAX trains
            # on a deterministic subset of that size
            srows = (
                tvecs.orderBy(F.xxhash64(F.col(VECTOR_COL)))
                .limit(PQ_TRAIN_MAX)
                .collect()
            )
            sample = np.array([r[VECTOR_COL] for r in srows], dtype=np.float64)
            if sample.size and sample.shape[1] != dims:
                raise ValueError(
                    f"training_source dimensionality {sample.shape[1]} "
                    f"!= corpus dimensionality {dims}"
                )
            if len(sample) < k:
                raise ValueError(
                    f"training_source has {len(sample)} vectors but {k} "
                    "partitions were requested — k-means needs at least "
                    "k training points"
                )
        else:
            if training_sampling_policy == "first_n":
                # reference FIRST_N (ingestion.py:34-36): the corpus head
                # in id order trains both codebooks and coarse centroids
                srows = (
                    vectors.orderBy(F.col(ID_COL)).limit(PQ_TRAIN_MAX).collect()
                )
            elif training_sampling_policy != "random":
                raise ValueError(
                    f"unknown training_sampling_policy "
                    f"{training_sampling_policy!r} — 'random' or 'first_n'"
                )
            else:
                frac = min(1.0, (PQ_TRAIN_MAX * 1.2) / max(n, 1))
                srows = (
                    (vectors.sample(fraction=frac, seed=seed) if frac < 1.0 else vectors)
                    .orderBy(F.xxhash64(ID_COL), F.col(ID_COL))
                    .limit(PQ_TRAIN_MAX)
                    .collect()
                )
            if is_byte_dtype(vector_dtype):
                sample = decode_matrix([r[VECTOR_COL] for r in srows], vector_dtype)
            else:
                sample = np.array([r[VECTOR_COL] for r in srows], dtype=np.float64)

        if copy_centroids_from is not None:
            centroids = np.asarray(copy_centroids_from, dtype=np.float64)
            k = centroids.shape[0]
        elif training_source is not None:
            centroids = kmeans_numpy(
                sample, k, max_iter=10, seed=seed, init="k-means++"
            )
        else:
            sample_size = training_sample_size or default_training_sample_size(n, k)
            if (
                sample_size <= CENTRALIZED_SAMPLE_MAX
                and k <= CENTRALIZED_K_MAX
                and len(sample) >= min(sample_size, n)
            ):
                centroids = kmeans_numpy(
                    sample[:sample_size], k, max_iter=10, seed=seed,
                    init="k-means++",
                )
            else:
                centroids = train_centroids_ml(
                    vectors, k, sample_size, n, seed=seed,
                    sampling_policy=training_sampling_policy,
                )

        # the encoding flavor is an INDEX-WIDE invariant: a fresh index
        # writes residual codes (spark-0.3), but a new snapshot ingested
        # onto an existing pre-0.3 index must keep writing raw codes —
        # its meta (and therefore the scorer dispatch) says raw
        residual = True
        if existing_meta is not None:
            residual = bool(existing_meta.get("pq_residual", False))
        else:
            storage.init_meta(
                index_type=cls.index_type,
                metric=metric.value,
                dimensions=dims,
                num_subspaces=num_subspaces,
                vector_dtype=vector_dtype,
                pq_residual=True,
            )

        # codebooks train on COARSE RESIDUALS (sample − assigned centroid):
        # per-cell residual distributions are tight around zero, so 256
        # codes per subspace resolve them far better than the raw vectors
        codebooks = train_pq_codebooks(
            _coarse_residuals(sample, centroids) if residual else sample,
            num_subspaces,
            seed=seed,
        )

        # with an overlay coming, the fused kernel also emits the
        # boundary-margin columns and the encoded frame persists across
        # the base write + overlay selection — ONE corpus scan feeds all
        # of it instead of the overlay re-deriving the coarse assignment
        build_overlay = overlay and centroids.shape[0] > 1
        encoded = assign_and_encode_kernel(
            vectors, centroids, codebooks, VECTOR_COL, PARTITION_COL,
            vector_dtype=vector_dtype, residual=residual,
            with_margins=build_overlay,
        )
        if build_overlay:
            from pyspark import StorageLevel

            encoded = encoded.persist(StorageLevel.MEMORY_AND_DISK)
        extra_meta: dict = {}
        if overlay:
            # persist the overlay knobs so consolidation rebuilds the
            # overlay at the SAME caps (mirrors IVFFlatIndex.ingest)
            extra_meta["overlay_max"] = int(overlay_max)
            extra_meta["overlay_boost_max"] = int(overlay_boost_max)
            if overlay_audit_nprobe is not None:
                extra_meta["overlay_audit_nprobe"] = int(overlay_audit_nprobe)
        try:
            cls._write_snapshot(
                storage, encoded, centroids, codebooks, ts, n,
                extra_meta=extra_meta,
            )
            if build_overlay:
                cls._write_overlay(
                    storage, encoded, centroids, ts, vector_dtype,
                    overlay_max, audit_nprobe=overlay_audit_nprobe,
                    boost_max=overlay_boost_max, n_total=int(n),
                )
        finally:
            if build_overlay:
                encoded.unpersist()
        idx = cls(spark, uri)
        if recall_curve:
            # measure + persist the operating-point curve on the fresh
            # snapshot (Index.measure_recall_curve) so queries can say
            # recall_target=... instead of hand-picking probe knobs
            idx.measure_recall_curve()
        return idx

    @staticmethod
    def _write_overlay(
        storage: IndexStorage,
        assigned: DataFrame,
        centroids: np.ndarray,
        ts: int,
        vector_dtype: str,
        overlay_max: int,
        audit_nprobe: int | None = None,
        boost_max: int = 0,
        n_total: int | None = None,
    ) -> None:
        """Write the partial-probe bridge set as aux pseudo-partition
        ``OVERLAY_PID`` with RAW vectors (not codes) — members duplicate
        their home-partition copies and the query path dedups on
        (query, id), exactly like IVF_FLAT; selection is the shared
        ``indexes.overlay.select_overlay_ids``.  Storing vectors keeps
        the overlay scan EXACT: a bridge row's distance never suffers
        ADC quantization error, so the overlay also acts as a bounded
        exact re-rank set at every k_factor."""
        from tiledb_vector_search_spark.indexes.overlay import (
            select_overlay_ids,
        )

        spark = assigned.sparkSession
        picked_id_list = select_overlay_ids(
            assigned, centroids, vector_dtype, overlay_max,
            boost_max=boost_max, audit_nprobe=audit_nprobe,
            n_total=n_total,
        )
        picked_ids = small_df(
            spark, [(int(i),) for i in picked_id_list], f"{ID_COL} long"
        )
        (
            assigned.select(ID_COL, VECTOR_COL)
            .join(F.broadcast(picked_ids), ID_COL, "left_semi")
            .withColumn(PARTITION_COL, F.lit(OVERLAY_PID).cast("int"))
            .coalesce(1)
            .write.parquet(storage.aux_path(OVERLAY_AUX, ts))
        )

    def _overlay_frame(self) -> DataFrame | None:
        """The bridge set (partition_id, external_id, vector) — raw
        vectors, pseudo-partition ``OVERLAY_PID`` — or ``None`` when the
        index was built without an overlay."""
        if hasattr(self, "_overlay_cache"):
            return self._overlay_cache

        def load():
            path = self.storage.aux_path(OVERLAY_AUX, self.base_ts)
            if not self.storage.fs.exists(path):
                return None
            return self.spark.read.parquet(path).select(
                PARTITION_COL, ID_COL, VECTOR_COL
            )

        # immutable per snapshot: resolve the reader (exists + listing +
        # schema, ~0.1 s of driver round-trips) once per session
        nonce = self._snapshot_nonce()
        if nonce is None:
            self._overlay_cache = load()
        else:
            self._overlay_cache = cached_snapshot_artifact(
                ("overlay_df", id(self.spark), self.uri, self.base_ts, nonce),
                load,
            )
        return self._overlay_cache

    @property
    def has_overlay(self) -> bool:
        return self._overlay_frame() is not None

    def _overlay_scored(
        self,
        q: DataFrame,
        k: int,
        metric: DistanceMetric,
        allowed_ids: DataFrame | None,
        excluded_ids: DataFrame | None = None,
    ) -> DataFrame | None:
        """Exact per-query top-k over the bridge set, in the FINAL
        distance domain — union-ready against the re-ranked / sqrt-ed
        coarse result.  Applies the same tombstone/filter contract as
        the base scan: a deleted overlay member must mask BOTH copies.

        Scale shape: the overlay is the SMALL side (≤ the persisted
        caps — the same bounded-collect class as the centroids), so it
        broadcasts and the QUERIES stream through one ``mapInPandas``
        with a per-batch partial top-k — no cross-product ever shuffles
        and the cost scales with nq through normal query partitioning,
        in the kernel AND join strategies alike (a crossJoin from the
        one-file overlay side would funnel nq × |overlay| rows through
        a single task at bulk nq)."""
        import pandas as pd

        overlay = self._overlay_frame()
        if overlay is None:
            return None
        if (
            self._has_updates()
            or allowed_ids is not None
            or excluded_ids is not None
        ):
            # the bridge set must honor the call's tombstone/filter view
            ov = overlay.select(ID_COL, VECTOR_COL)
            if self._has_updates():
                ov = ov.join(
                    F.broadcast(self._updated_ids()), ID_COL, "left_anti"
                )
            if allowed_ids is not None:
                ov = ov.join(allowed_ids, ID_COL, "left_semi")
            if excluded_ids is not None:
                ov = ov.join(excluded_ids, ID_COL, "left_anti")
            ov_rows = self._float_vectors(ov).collect()
            if not ov_rows:
                return None
            ov_ids = np.array([r[ID_COL] for r in ov_rows], dtype=np.int64)
            ov_mat = np.array(
                [r[VECTOR_COL] for r in ov_rows], dtype=np.float64
            )
        else:
            # common path: the bridge set is immutable for a given
            # base_ts, so the bounded collect is paid once per handle —
            # repeated queries skip the job entirely
            if not hasattr(self, "_overlay_np_cache"):
                ov_rows = self._float_vectors(
                    overlay.select(ID_COL, VECTOR_COL)
                ).collect()
                self._overlay_np_cache = (
                    np.array([r[ID_COL] for r in ov_rows], dtype=np.int64),
                    np.array(
                        [r[VECTOR_COL] for r in ov_rows], dtype=np.float64
                    ),
                )
            ov_ids, ov_mat = self._overlay_np_cache
            if ov_ids.size == 0:
                return None
        bc = self.spark.sparkContext.broadcast((ov_ids, ov_mat))
        kk = min(k, len(ov_ids))
        sqrt_out = metric is DistanceMetric.L2

        def score(batches):
            ids_, mat_ = bc.value
            v_sq = np.sum(mat_ * mat_, axis=1)
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                qids = pdf[QUERY_ID_COL].to_numpy(dtype=np.int64)
                qmat = np.array(list(pdf[VECTOR_COL]), dtype=np.float64)
                # chunk the query axis so the (chunk × |overlay|) gram
                # slab stays ~100 MB regardless of the Arrow batch size
                for lo in range(0, n, 2048):
                    qc = qmat[lo : lo + 2048]
                    d = np.maximum(
                        np.sum(qc * qc, axis=1)[:, None]
                        + v_sq[None, :]
                        - 2.0 * (qc @ mat_.T),
                        0.0,
                    )
                    idx = partial_topk_idx(d, ids_, kk)
                    rows = np.arange(d.shape[0])[:, None]
                    dist = d[rows, idx]
                    if sqrt_out:
                        dist = np.sqrt(dist)
                    yield pd.DataFrame(
                        {
                            QUERY_ID_COL: np.repeat(
                                qids[lo : lo + 2048], kk
                            ),
                            ID_COL: ids_[idx].ravel(),
                            DISTANCE_COL: dist.ravel(),
                        }
                    )

        return q.mapInPandas(
            score,
            schema=f"{QUERY_ID_COL} long, {ID_COL} long, "
            f"{DISTANCE_COL} double",
        )

    @staticmethod
    def _write_snapshot(
        storage: IndexStorage,
        encoded: DataFrame,
        centroids: np.ndarray,
        codebooks: np.ndarray,
        ts: int,
        base_size: int | None,
        extra_meta: dict | None = None,
    ) -> None:
        spark = storage.spark
        # shuffle on partition_id before partitionBy (see IVFFlatIndex note:
        # avoids the every-task-writes-every-directory small-files blowup).
        # __second/__margin are overlay-selection intermediates, not index
        # state — the snapshot schema is unchanged by with_margins ingest
        storage.write_base(
            encoded.drop("__second", "__margin")
            .repartition(PARTITION_COL)
            .sortWithinPartitions(ID_COL),
            ts,
            partition_by=PARTITION_COL,
            base_size=base_size,
            extra_meta={
                "partitions": int(centroids.shape[0]),
                **(extra_meta or {}),
            },
        )
        write_small_parquet(
            spark,
            storage.centroids_path(ts),
            [(int(i), [float(v) for v in c]) for i, c in enumerate(centroids)],
            f"{PARTITION_COL} int, centroid array<double>",
        )
        m, n_codes, sub_dim = codebooks.shape
        rows = [
            (int(j), int(c), [float(v) for v in codebooks[j, c]])
            for j in range(m)
            for c in range(n_codes)
        ]
        write_small_parquet(
            spark, storage.aux_path(PQ_CODEBOOK_AUX, ts), rows,
            "subspace int, code int, centroid array<double>",
        )

    CONSOLIDATE_KWARGS = frozenset(
        {"retrain_index", "partitions", "split_hot_cells", "cell_cap"}
    )

    def _write_consolidated(
        self,
        vectors: DataFrame,
        ts: int,
        retrain_index: bool = False,
        split_hot_cells: bool = False,
        cell_cap: int | None = None,
        **kw: Any,
    ) -> None:
        """Re-assign + re-encode; reuse centroids/codebooks unless retrain.

        ``split_hot_cells=True`` (r11): the surgical skew remedy on the
        PQ coarse level, same contract as IVF_FLAT — over-cap cells
        split into sub-centroids, cold centroids survive byte-identical.
        This is SAFE for the residual codes because every consolidation
        already re-encodes the whole corpus through
        ``assign_and_encode_kernel`` (residual = vector − assigned
        centroid, computed fresh per fold): split-cell members encode
        against their NEW sub-centroids in the same pass, and cold
        cells' codes come out byte-identical (same centroid, same
        codebooks, deterministic kernel).  The CODEBOOKS stay as
        trained — sub-centroids only shrink the residual magnitudes
        they quantize, which tightens (never widens) quantization
        error; re-fitting them to the new residual distribution is what
        ``retrain_index=True`` is for."""
        if retrain_index and split_hot_cells:
            raise ValueError(
                "retrain_index=True already re-trains every centroid — "
                "combining it with split_hot_cells is ambiguous (which "
                "wins?); pass exactly one"
            )
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
        if retrain_index:
            train_src = self._float_vectors(vectors)
            n = vectors.count()
            k = kw.get("partitions") or default_partitions(n)
            centroids = train_centroids_ml(
                train_src, k, default_training_sample_size(n, k), n
            )
            # hash-ordered take, NOT a bare limit(): limit takes
            # whichever tasks finish first, so the retrained codebooks
            # (and the consolidated snapshot's recall) would drift run
            # to run — the exact nondeterminism the ingest path's
            # ordered sample above exists to prevent
            srows = (
                train_src.select(ID_COL, VECTOR_COL)
                .orderBy(F.xxhash64(ID_COL), F.col(ID_COL))
                .limit(PQ_TRAIN_MAX)
                .collect()
            )
            sample = np.array([r[VECTOR_COL] for r in srows], dtype=np.float64)
            codebooks = train_pq_codebooks(
                _coarse_residuals(sample, centroids)
                if self.pq_residual
                else sample,
                self.num_subspaces,
            )
        else:
            centroids = self.centroids()
            codebooks = self.codebooks()
            if split_hot_cells:
                # the first-pass assignment is count-only here (the
                # final pass must run assign_and_encode_kernel anyway),
                # so discard it either way
                centroids, _ = self._split_pass(
                    vectors.select(ID_COL, VECTOR_COL), centroids, cell_cap
                )
        build_overlay = self.has_overlay and centroids.shape[0] > 1
        encoded = assign_and_encode_kernel(
            vectors.select(ID_COL, VECTOR_COL),
            centroids,
            codebooks,
            VECTOR_COL,
            PARTITION_COL,
            vector_dtype=self.vector_dtype,
            residual=self.pq_residual,
            with_margins=build_overlay,
        )
        if build_overlay:
            from pyspark import StorageLevel

            encoded = encoded.persist(StorageLevel.MEMORY_AND_DISK)
        extra_meta: dict = {}
        if self.has_overlay:
            # the consolidated snapshot keeps the old base's overlay caps
            # (legacy metas without them fall back to the defaults)
            prev = self._base_entry()
            for key, dflt in (
                ("overlay_max", DEFAULT_OVERLAY_MAX),
                ("overlay_boost_max", 0),
                ("overlay_audit_nprobe", None),
            ):
                if prev.get(key, dflt) is not None:
                    extra_meta[key] = prev.get(key, dflt)
        try:
            self._write_snapshot(
                self.storage, encoded, centroids, codebooks, ts, None,
                extra_meta=extra_meta,
            )
            if build_overlay:
                self._write_overlay(
                    self.storage, encoded, centroids, ts,
                    self.vector_dtype,
                    int(extra_meta.get("overlay_max", DEFAULT_OVERLAY_MAX)),
                    audit_nprobe=extra_meta.get("overlay_audit_nprobe"),
                    boost_max=int(extra_meta.get("overlay_boost_max", 0)),
                )
        finally:
            if build_overlay:
                encoded.unpersist()

    # -- access ---------------------------------------------------------------

    @property
    def num_subspaces(self) -> int:
        return int(self.meta["num_subspaces"])

    @property
    def pq_residual(self) -> bool:
        """True when codes quantize coarse residuals (storage spark-0.3+);
        False for raw-vector codes (pre-0.3 indexes — still readable)."""
        return bool(self.meta.get("pq_residual", False))

    def centroids(self) -> np.ndarray:
        # memoized per open AND process-wide per snapshot_nonce:
        # streaming loops re-open the index every micro-batch (snapshot
        # discipline), and without the shared cache each re-open paid
        # one Spark collect job for an immutable artifact
        cached = getattr(self, "_centroids_cache", None)
        if cached is not None:
            return cached

        def load():
            from tiledb_vector_search_spark.driver_io import read_small_rows

            rows = read_small_rows(
                self.spark,
                self.storage.centroids_path(self.base_ts),
                order_by=(PARTITION_COL,),
            )
            return np.array([r["centroid"] for r in rows], dtype=np.float64)

        nonce = self._base_entry().get("snapshot_nonce")
        if nonce is None:  # legacy meta: per-handle memo only
            self._centroids_cache = load()
        else:
            self._centroids_cache = cached_snapshot_artifact(
                ("centroids", self.uri, self.base_ts, nonce), load
            )
        return self._centroids_cache

    def codebooks(self) -> np.ndarray:
        """(num_subspaces, 256, sub_dim) from the aux table (memoized
        per open and process-wide per snapshot — see centroids())."""
        cached = getattr(self, "_codebooks_cache", None)
        if cached is not None:
            return cached

        def load():
            from tiledb_vector_search_spark.driver_io import read_small_rows

            rows = read_small_rows(
                self.spark,
                self.storage.aux_path(PQ_CODEBOOK_AUX, self.base_ts),
                order_by=("subspace", "code"),
            )
            m = self.num_subspaces
            n_codes = len(rows) // m
            sub_dim = len(rows[0]["centroid"])
            out = np.empty((m, n_codes, sub_dim), dtype=np.float64)
            for r in rows:
                out[r["subspace"], r["code"]] = r["centroid"]
            return out

        nonce = self._base_entry().get("snapshot_nonce")
        if nonce is None:
            self._codebooks_cache = load()
        else:
            self._codebooks_cache = cached_snapshot_artifact(
                ("pq_codebooks", self.uri, self.base_ts, nonce), load
            )
        return self._codebooks_cache

    @property
    def partitions(self) -> int:
        return int(self._base_entry()["partitions"])

    def _base_entry(self) -> dict:
        for e in reversed(self.meta["ingestions"]):
            if e["ts"] == self.base_ts:
                return e
        raise RuntimeError("no ingestion entry for base_ts")

    def _recall_curve_settings(self) -> list:
        # nprobe ladder x re-rank depth: k_factor=1 is the pure-ADC
        # row, k_factor=4 the exact-re-rank row (the family's gated
        # operating point)
        grid, p = [], 1
        while p < self.partitions:
            grid.append(p)
            p *= 2
        grid.append(self.partitions)
        return [
            {"nprobe": p, "k_factor": kf}
            for kf in (1.0, 4.0)
            for p in grid
        ]

    # -- query ----------------------------------------------------------------

    # query batches beyond this route via a distributed join instead of a
    # driver collect (same contract as IVFFlatIndex.LARGE_NQ): bulk
    # dataset-vs-dataset search must not materialize queries on the driver
    LARGE_NQ = 4096

    def query(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int | None = None,
        k_factor: float = 1.0,
        pad: bool = False,
        strategy: str = "auto",
        allowed_ids: DataFrame | None = None,
        excluded_ids: DataFrame | None = None,
        recall_target: float | None = None,
        **kw: Any,
    ) -> DataFrame:
        """ADC scan over codes → optional exact re-rank (reference
        ``ivf_pq_index.py:121-163``).

        ``recall_target`` resolves (nprobe, k_factor) from this
        snapshot's measured recall curve
        (``Index.measure_recall_curve``) — the cheapest setting that
        cleared the target; mutually exclusive with explicit knobs.

        ``allowed_ids`` (DataFrame with ``external_id``) = filtered-search
        pushdown: the probed-partition code scan is semi-joined on the
        allowed set BEFORE ADC scoring, so coarse candidates (and the
        re-rank) never leave the filter — same contract as IVF_FLAT;
        safe here because scoring is a partition scan, not a graph walk.
        ``excluded_ids`` is the anti-join twin: ids removed BEFORE the
        coarse top-k, so excluded rows never crowd candidate slots (the
        streaming embedding screen's batch-mate exclusion).

        ``k_factor=1`` returns ADC (approximate) distances, like the
        reference; ``k_factor>1`` fetches ``k_factor·k`` coarse candidates
        and re-scores them exactly against the original vectors.

        Strategies: ``kernel`` (driver-built ADC tables broadcast to a
        mapInPandas scan — small query batches), ``join`` (fully
        distributed: routing and ADC scoring keyed by joins, no driver
        collect — large batches), ``auto`` (kernel below LARGE_NQ, join
        above).
        """
        if not self.query_base_array:
            # updates-only range open: no base, no codes to ADC-scan —
            # exact scan over the window's additions (Index doc)
            return self._updates_only_query(
                queries, k, pad=pad,
                allowed_ids=allowed_ids, excluded_ids=excluded_ids,
            )
        # schema/kwargs only — the row-level check rides the kernel
        # collect below; join paths run the distributed agg check (r11)
        self._validate_queries(queries, k, kw, data_check=False)
        if recall_target is not None:
            if nprobe is not None or k_factor != 1.0:
                raise ValueError(
                    "pass either (nprobe, k_factor) or recall_target, "
                    "not both"
                )
            resolved = self.resolve_recall_target(recall_target)
            nprobe = int(resolved["nprobe"])
            k_factor = float(resolved.get("k_factor", 1.0))
        nprobe = nprobe or max(1, int(np.sqrt(self.partitions)))
        metric = self.metric
        coarse_k = max(k, int(math.ceil(k * k_factor)))

        q = queries.select(QUERY_ID_COL, VECTOR_COL)
        if strategy == "auto":
            # one job: the bounded collect doubles as the small-batch fetch
            q_rows = q.limit(self.LARGE_NQ + 1).collect()
            if len(q_rows) > self.LARGE_NQ:
                self._validate_queries(queries)  # distributed data check
                return self._query_join(
                    q, k, nprobe, k_factor, pad, queries, allowed_ids,
                    excluded_ids,
                )
        elif strategy == "join":
            self._validate_queries(queries)
            return self._query_join(
                q, k, nprobe, k_factor, pad, queries, allowed_ids,
                excluded_ids,
            )
        elif strategy == "kernel":
            q_rows = q.collect()
        else:
            raise ValueError(f"unknown strategy: {strategy}")
        self._validate_query_rows(q_rows)
        qids = np.array([r[0] for r in q_rows], dtype=np.int64)
        qmat = np.array([r[1] for r in q_rows], dtype=np.float64)

        # routing is a driver-side numpy task (centroids ≤10k) — no Spark
        # round-trip
        pairs = route_queries(qids, qmat, self.centroids(), nprobe)
        parts = sorted({p for _, p in pairs})
        base = self._base_vectors().where(F.col(PARTITION_COL).isin(parts))
        if self._has_updates():
            base = base.join(F.broadcast(self._updated_ids()), ID_COL, "left_anti")
        if allowed_ids is not None:
            allowed_ids = allowed_ids.select(
                integral_id_col(
                    allowed_ids, ID_COL, "IVFPQIndex.query allowed_ids"
                ).alias(ID_COL)
            )
            base = base.join(allowed_ids, ID_COL, "left_semi")
        if excluded_ids is not None:
            excluded_ids = excluded_ids.select(
                integral_id_col(
                    excluded_ids, ID_COL, "IVFPQIndex.query excluded_ids"
                ).alias(ID_COL)
            )
            base = base.join(excluded_ids, ID_COL, "left_anti")

        coarse = self._adc_scores(
            base, qids, qmat, pairs, coarse_k,
            scan_tasks=self._kernel_scan_tasks(parts, len(qids)),
        )
        order = [F.col(DISTANCE_COL).asc(), F.col(ID_COL).asc()]
        coarse_topk = topk_window(coarse, [QUERY_ID_COL], order, coarse_k).drop(
            "rank"
        )

        if k_factor > 1.0:
            # exact re-rank join: candidates are tiny (nq·k·k_factor) —
            # broadcast them against the vector column of the pruned scan
            cand = coarse_topk.select(QUERY_ID_COL, ID_COL)
            # candidates all come from probed partitions, so the re-rank
            # scan reuses the partition-pruned, tombstone-filtered ``base``
            # rather than re-scanning the full table
            vecs = self._float_vectors(base).select(ID_COL, VECTOR_COL)
            qv = q.select(QUERY_ID_COL, F.col(VECTOR_COL).alias("__qvec"))
            reranked = (
                vecs.join(F.broadcast(cand), ID_COL)
                .join(F.broadcast(qv), QUERY_ID_COL)
                .select(
                    QUERY_ID_COL,
                    ID_COL,
                    distance_expr("__qvec", VECTOR_COL, metric).alias(
                        DISTANCE_COL
                    ),
                )
            )
            result = reranked
        else:
            if metric is DistanceMetric.L2:
                coarse_topk = coarse_topk.withColumn(
                    DISTANCE_COL, F.sqrt(F.col(DISTANCE_COL))
                )
            result = coarse_topk

        if self._has_updates():
            additions = self._additions()
            if allowed_ids is not None:
                additions = additions.join(allowed_ids, ID_COL, "left_semi")
            if excluded_ids is not None:
                additions = additions.join(excluded_ids, ID_COL, "left_anti")
            add_scored = knn_bruteforce_expr(additions, q, k, metric).drop("rank")
            result = result.unionByName(add_scored)

        ov_scored = self._overlay_scored(q, k, metric, allowed_ids, excluded_ids)
        if ov_scored is not None:
            # an overlay member whose home partition was also probed
            # appears twice — exact vs ADC (or exact vs exact after a
            # re-rank); min() keeps the tighter estimate and dedups
            result = (
                result.unionByName(ov_scored)
                .groupBy(QUERY_ID_COL, ID_COL)
                .agg(F.min(DISTANCE_COL).alias(DISTANCE_COL))
            )

        res = topk_window(result, [QUERY_ID_COL], order, k)
        if pad:
            from tiledb_vector_search_spark.operators.topk import pad_to_k

            res = pad_to_k(res, queries, k)
        return res

    def _query_join(
        self,
        q: DataFrame,
        k: int,
        nprobe: int,
        k_factor: float,
        pad: bool,
        queries: DataFrame,
        allowed_ids: DataFrame | None = None,
        excluded_ids: DataFrame | None = None,
    ) -> DataFrame:
        """Fully distributed ADC query plan: no driver materialization.

        routing = queries ⋈ broadcast(centroids) rank ≤ nprobe (the
        ``routing_table_join`` shape shared with ``IVFFlatIndex``); coarse =
        codes ⋈ routing ⋈ queries → per-batch ADC kernel with only the
        BROADCAST CODEBOOKS (m·256·sub_dim — constant size, unlike the
        per-query ADC tables the kernel path ships) → partial top-k →
        window merge; re-rank joins stay un-hinted so AQE sizes them (the
        candidate set is nq·k·k_factor — unbounded at bulk nq).
        """
        import pandas as pd

        from tiledb_vector_search_spark.operators.routing import (
            routing_table_join,
        )

        metric = self.metric
        coarse_k = max(k, int(math.ceil(k * k_factor)))
        routing = routing_table_join(
            q, self.centroids(), nprobe, QUERY_ID_COL, VECTOR_COL
        )
        base = self._base_vectors()
        if self._has_updates():
            base = base.join(F.broadcast(self._updated_ids()), ID_COL, "left_anti")
        if allowed_ids is not None:
            allowed_ids = allowed_ids.select(
                integral_id_col(
                    allowed_ids, ID_COL, "IVFPQIndex.query allowed_ids"
                ).alias(ID_COL)
            )
            base = base.join(allowed_ids, ID_COL, "left_semi")
        if excluded_ids is not None:
            excluded_ids = excluded_ids.select(
                integral_id_col(
                    excluded_ids, ID_COL, "IVFPQIndex.query excluded_ids"
                ).alias(ID_COL)
            )
            base = base.join(excluded_ids, ID_COL, "left_anti")

        bc = self.spark.sparkContext.broadcast(
            (
                self.codebooks(),
                self.centroids() if self.pq_residual else None,
            )
        )
        kk = coarse_k

        joined = (
            base.select(PARTITION_COL, ID_COL, CODE_COL)
            .join(routing, PARTITION_COL)
            .join(
                q.select(QUERY_ID_COL, F.col(VECTOR_COL).alias("__qvec")),
                QUERY_ID_COL,
            )
        )

        def score(batches):
            cb, cents = bc.value
            m, _n_codes, sub_dim = cb.shape
            arange_m = np.arange(m)
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                ids = pdf[ID_COL].to_numpy(dtype=np.int64)
                qids = pdf[QUERY_ID_COL].to_numpy(dtype=np.int64)
                codes = np.frombuffer(
                    b"".join(pdf[CODE_COL]), dtype=np.uint8
                ).reshape(n, m)
                qv = np.array(list(pdf["__qvec"]), dtype=np.float64)
                if cents is not None:
                    # residual codes: the ADC target is (q − centroid[pid])
                    pids = pdf[PARTITION_COL].to_numpy(dtype=np.int64)
                    qv = qv - cents[pids]
                qv = qv.reshape(n, m, sub_dim)
                # direct per-row gather — no per-query table build, so cost
                # is n·dims flops regardless of how many distinct queries
                # land in the batch
                diff = qv - cb[arange_m[None, :], codes]
                dist = np.einsum("nms,nms->n", diff, diff)
                out = pd.DataFrame(
                    {QUERY_ID_COL: qids, ID_COL: ids, DISTANCE_COL: dist}
                )
                # per-batch partial top-k bounds the window-merge shuffle at
                # O(batches · queries-in-batch · coarse_k)
                out = out.sort_values(
                    [QUERY_ID_COL, DISTANCE_COL, ID_COL], kind="mergesort"
                )
                yield out.groupby(QUERY_ID_COL, sort=False).head(kk)

        coarse = joined.mapInPandas(
            score,
            schema=f"{QUERY_ID_COL} long, {ID_COL} long, {DISTANCE_COL} double",
        )
        order = [F.col(DISTANCE_COL).asc(), F.col(ID_COL).asc()]
        coarse_topk = topk_window(coarse, [QUERY_ID_COL], order, coarse_k).drop(
            "rank"
        )

        if k_factor > 1.0:
            cand = coarse_topk.select(QUERY_ID_COL, ID_COL)
            vecs = self._float_vectors(base).select(ID_COL, VECTOR_COL)
            qv = q.select(QUERY_ID_COL, F.col(VECTOR_COL).alias("__qvec"))
            result = (
                vecs.join(cand, ID_COL)
                .join(qv, QUERY_ID_COL)
                .select(
                    QUERY_ID_COL,
                    ID_COL,
                    distance_expr("__qvec", VECTOR_COL, metric).alias(
                        DISTANCE_COL
                    ),
                )
            )
        else:
            if metric is DistanceMetric.L2:
                coarse_topk = coarse_topk.withColumn(
                    DISTANCE_COL, F.sqrt(F.col(DISTANCE_COL))
                )
            result = coarse_topk

        if self._has_updates():
            additions = self._additions()
            if allowed_ids is not None:
                additions = additions.join(allowed_ids, ID_COL, "left_semi")
            if excluded_ids is not None:
                additions = additions.join(excluded_ids, ID_COL, "left_anti")
            result = result.unionByName(
                knn_bruteforce_expr(additions, q, k, metric).drop("rank")
            )
        ov_scored = self._overlay_scored(q, k, metric, allowed_ids, excluded_ids)
        if ov_scored is not None:
            # dedup (query, id) pairs that the probe and the overlay both
            # produced — see the kernel path's comment
            result = (
                result.unionByName(ov_scored)
                .groupBy(QUERY_ID_COL, ID_COL)
                .agg(F.min(DISTANCE_COL).alias(DISTANCE_COL))
            )
        res = topk_window(result, [QUERY_ID_COL], order, k)
        if pad:
            from tiledb_vector_search_spark.operators.topk import pad_to_k

            res = pad_to_k(res, queries, k)
        return res

    def _float_vectors(self, base: DataFrame) -> DataFrame:
        """Promote a packed-binary vector column for expression-path joins
        (byte dtypes); float bases pass through."""
        from tiledb_vector_search_spark.functions.dtypes import (
            is_byte_dtype,
            unpack_vectors,
        )

        if is_byte_dtype(self.vector_dtype):
            return unpack_vectors(base, self.vector_dtype, VECTOR_COL)
        return base

    def _adc_scores(
        self,
        base: DataFrame,
        qids: np.ndarray,
        qmat: np.ndarray,
        pairs: list[tuple[int, int]],
        coarse_k: int,
        scan_tasks: int | None = None,
    ) -> DataFrame:
        """Asymmetric-distance scan: per-query lookup tables over codes.

        Reference ``sub_distance_asymmetric`` + table builder
        (``ivf_pq_index.h:627-690``) — table[q, j, c] = ‖q_sub_j − cb[j,c]‖²;
        vector distance ≈ Σ_j table[q, j, code_j].  Reads only the
        (partition_id, external_id, code) columns.

        Residual indexes (spark-0.3) shift the table target per probed
        partition: table[q, pid, j, c] = ‖(q − centroid[pid])_sub_j −
        cb[j,c]‖², built INSIDE the kernel from the broadcast (queries,
        centroids, codebooks) — routed·dims·256 flops per partition, so
        the broadcast stays constant-size instead of nq·nprobe·m·256.
        """
        import pandas as pd

        cb = self.codebooks()  # (m, 256, sub_dim)
        m, n_codes, sub_dim = cb.shape
        nq = qmat.shape[0]
        residual = self.pq_residual
        cents = self.centroids() if residual else None

        route_map: dict[int, list[int]] = {}
        for qid, pid in pairs:
            route_map.setdefault(pid, []).append(qid)
        qpos = {int(qid): i for i, qid in enumerate(qids)}
        if residual:
            payload = (qids, qmat, cb, cents, route_map, qpos)
        else:
            tables = np.empty((nq, m, n_codes), dtype=np.float64)
            for j in range(m):
                qs = qmat[:, j * sub_dim : (j + 1) * sub_dim]  # (nq, sub_dim)
                # ‖qs − c‖² for all codes
                tables[:, j, :] = (
                    np.sum(qs * qs, axis=1)[:, None]
                    + np.sum(cb[j] * cb[j], axis=1)[None, :]
                    - 2.0 * (qs @ cb[j].T)
                )
            np.maximum(tables, 0.0, out=tables)
            payload = (qids, tables, None, None, route_map, qpos)
        bc = self.spark.sparkContext.broadcast(payload)
        kk = coarse_k
        mm = m
        sd = sub_dim

        def score(batches):
            qids_l, tab_or_q, cb_l, cents_l, rmap, qpos_l = bc.value
            arange_m = np.arange(mm)
            if cb_l is not None:
                cb_sq = np.sum(cb_l * cb_l, axis=2)  # (m, 256)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for pid, grp in pdf.groupby(PARTITION_COL):
                    routed = rmap.get(int(pid))
                    if not routed:
                        continue
                    ids = grp[ID_COL].to_numpy(dtype=np.int64)
                    codes = np.frombuffer(
                        b"".join(grp[CODE_COL]), dtype=np.uint8
                    ).reshape(len(ids), mm)
                    rpos = [qpos_l[qid] for qid in routed]
                    if cb_l is not None:
                        # residual tables for THIS partition's routed queries
                        qres = tab_or_q[rpos] - cents_l[int(pid)][None, :]
                        t_pid = np.empty((len(routed), mm, cb_sq.shape[1]))
                        for j in range(mm):
                            qs = qres[:, j * sd : (j + 1) * sd]
                            t_pid[:, j, :] = (
                                np.sum(qs * qs, axis=1)[:, None]
                                + cb_sq[j][None, :]
                                - 2.0 * (qs @ cb_l[j].T)
                            )
                        np.maximum(t_pid, 0.0, out=t_pid)
                        tabs = t_pid
                    else:
                        tabs = tab_or_q[rpos]
                    keep = min(kk, len(ids))
                    dmat = np.empty((len(routed), len(ids)))
                    for qi in range(len(routed)):
                        dmat[qi] = tabs[qi][
                            arange_m[None, :], codes
                        ].sum(axis=1)
                    idx = partial_topk_idx(dmat, ids, keep)
                    yield pd.DataFrame(
                        {
                            QUERY_ID_COL: np.repeat(
                                np.asarray(routed, dtype=np.int64), keep
                            ),
                            ID_COL: ids[idx.ravel()],
                            DISTANCE_COL: dmat[
                                np.arange(len(routed))[:, None], idx
                            ].ravel(),
                        }
                    )

        sel = base.select(PARTITION_COL, ID_COL, CODE_COL)
        if scan_tasks is not None:
            # byte-derived task count (Index._kernel_scan_tasks) — a
            # no-op whenever the scan already has fewer splits
            sel = sel.coalesce(scan_tasks)
        return sel.mapInPandas(
            score,
            schema=f"{QUERY_ID_COL} long, {ID_COL} long, {DISTANCE_COL} double",
        )
