"""K-means training for IVF partitioning.

Reference trains centroids three ways (SURVEY §2.4): centralized sklearn
KMeans on a ≤1M sample (``ingestion.py:1343-1414``), its own C++ Lloyd's
(``src/include/index/kmeans.h``), and a hand-rolled distributed 5-iteration
loop (``ingestion.py:1419-1580``).  Spark-first: ``pyspark.ml.clustering.
KMeans`` *is* the distributed partial+final aggregation loop the reference
hand-rolls — k-means|| init, Lloyd iterations as map-side partial sums +
reduce, all JVM-side.

Also provides a small numpy Lloyd's for PQ sub-space codebooks, where the
sample is tiny (≤100k × ≤16 dims per subspace) and 256-centroid training is
a driver-side micro-task (matching the reference's judgment — it trains PQ
codebooks on the driver too, ``ivf_pq_index.h:559-607``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.schemas import PARTITION_COL, VECTOR_COL

# Reference auto-config constants (``ingestion.py:336-353, 3180-3193``).
MAX_PARTITIONS = 10_000
MAX_TRAINING_SAMPLE = 1_000_000


def default_partitions(n: int) -> int:
    """partitions = √n capped at 10k (reference ``ingestion.py:3180-3186``)."""
    return max(1, min(int(np.sqrt(n)), MAX_PARTITIONS))


def default_training_sample_size(n: int, partitions: int) -> int:
    """min(n, 100·partitions, 1M) (reference ``ingestion.py:350-353``)."""
    return max(1, min(n, 100 * partitions, MAX_TRAINING_SAMPLE))


# below these bounds the sample trains centralized on the driver (the
# reference's own judgment: centralised_kmeans_udf runs sklearn on a ≤1M
# sample, ingestion.py:1343-1414); Spark ML's k-means|| rounds cost seconds
# of JVM scheduling that dwarf the numpy fit on small samples
CENTRALIZED_SAMPLE_MAX = 100_000
CENTRALIZED_K_MAX = 1024


def train_centroids_ml(
    vectors: DataFrame,
    k: int,
    sample_size: int,
    total: int,
    vector_col: str = VECTOR_COL,
    max_iter: int = 10,
    seed: int = 42,
    sampling_policy: str = "random",
) -> np.ndarray:
    """KMeans on a sample → (k, d) float64 centroid matrix.

    Small samples (≤100k rows, k ≤ 1024) train centralized with numpy
    k-means++ on the driver — exactly the reference's centralized path; the
    distributed Spark ML form kicks in beyond that.  maxIter=10 matches the
    reference's sklearn call (``ingestion.py:1384-1391``).

    ``sampling_policy`` mirrors the reference's ``TrainingSamplingPolicy``
    (``ingestion.py:34-36``): ``"random"`` (default) is the seeded
    deterministic uniform pick (hash-ordered take — same distribution as
    the reference's RANDOM, reproducible across runs); ``"first_n"``
    takes the first ``sample_size`` rows in id order — the reference's
    FIRST_N reads the array's first N positions, and on append-ordered
    corpora that means training NEVER sees the newest data, which is why
    it is not the default here.
    """
    if sampling_policy not in ("random", "first_n"):
        raise ValueError(
            f"unknown sampling_policy {sampling_policy!r} — "
            "'random' (seeded uniform) or 'first_n' (reference FIRST_N)"
        )
    if sampling_policy == "first_n":
        from tiledb_vector_search_spark.schemas import ID_COL

        ordered = (
            vectors.orderBy(F.col(ID_COL))
            if ID_COL in vectors.columns
            # no id column: "first" = storage order (the reference's
            # FIRST_N is exactly the array's physical head)
            else vectors
        )
        sample = ordered.limit(sample_size)
        if sample_size <= CENTRALIZED_SAMPLE_MAX and k <= CENTRALIZED_K_MAX:
            x = np.array(
                [r[0] for r in sample.select(F.col(vector_col)).collect()],
                dtype=np.float64,
            )
            return kmeans_numpy(x, k, max_iter=max_iter, seed=seed, init="k-means++")
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = sample.select(
            array_to_vector(F.col(vector_col).cast("array<double>")).alias("features")
        )
        model = KMeans(
            k=k, maxIter=max_iter, seed=seed, initMode="k-means||"
        ).fit(feats)
        return np.array(model.clusterCenters(), dtype=np.float64)
    frac = min(1.0, (sample_size * 1.2) / max(total, 1))
    sample = vectors if frac >= 1.0 else vectors.sample(fraction=frac, seed=seed)

    if sample_size <= CENTRALIZED_SAMPLE_MAX and k <= CENTRALIZED_K_MAX:
        # bare limit() takes whichever rows' tasks finish first — the
        # training sample (and every downstream recall number) then
        # drifts run to run.  An ordered take is deterministic and
        # Catalyst executes it as distributed TakeOrdered (per-partition
        # top-k + driver merge), not a full sort.  Order by a HASH of
        # the id, not the id: ordering by raw id would systematically
        # exclude the highest-id tail of the 1.2×-oversampled pool —
        # on append-ordered corpora that region (e.g. the newest crawl
        # batch) would never train the centroids.
        from tiledb_vector_search_spark.schemas import ID_COL

        if ID_COL in sample.columns:
            rows = (
                sample.select(F.col(ID_COL), F.col(vector_col))
                .orderBy(F.xxhash64(ID_COL), F.col(ID_COL))
                .limit(sample_size)
                .collect()
            )
            x = np.array([r[1] for r in rows], dtype=np.float64)
        else:
            # no id column: hash the vector itself for the deterministic
            # order — a bare limit() here would reintroduce the exact
            # task-arrival drift the comment above exists to prevent
            rows = (
                sample.select(F.col(vector_col))
                .orderBy(F.xxhash64(F.col(vector_col)))
                .limit(sample_size)
                .collect()
            )
            x = np.array([r[0] for r in rows], dtype=np.float64)
        return kmeans_numpy(x, k, max_iter=max_iter, seed=seed, init="k-means++")

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = sample.select(
        array_to_vector(F.col(vector_col).cast("array<double>")).alias("features")
    )
    model = KMeans(
        k=k, maxIter=max_iter, seed=seed, initMode="k-means||"
    ).fit(feats)
    return np.array(model.clusterCenters(), dtype=np.float64)


def _kmeans_pp_init(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """k-means++ seeding (reference ``kmeans_pp``, ``kmeans.h:72-180``)."""
    n = x.shape[0]
    centroids = np.empty((k, x.shape[1]), dtype=np.float64)
    centroids[0] = x[rng.integers(n)]
    d2 = np.sum((x - centroids[0]) ** 2, axis=1)
    for i in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        centroids[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, np.sum((x - centroids[i]) ** 2, axis=1))
    return centroids


def kmeans_numpy(
    x: np.ndarray,
    k: int,
    max_iter: int = 10,
    seed: int = 42,
    init: str = "random",
) -> np.ndarray:
    """Plain Lloyd's for centralized problems (PQ codebooks, small samples).

    Reference analogue: ``sub_kmeans_random_init`` (``kmeans.h:423-615``)
    and ``kmeans_pp`` init (``kmeans.h:72-180``).
    """
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    k = min(k, n)
    if init == "k-means++":
        centroids = _kmeans_pp_init(x, k, rng)
    else:
        centroids = x[rng.choice(n, size=k, replace=False)].astype(np.float64)
    for _ in range(max_iter):
        # pairwise sq dists via the BLAS identity
        d = (
            np.sum(x * x, axis=1)[:, None]
            + np.sum(centroids * centroids, axis=1)[None, :]
            - 2.0 * (x @ centroids.T)
        )
        assign = np.argmin(d, axis=1)
        new = np.zeros_like(centroids)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        np.add.at(new, assign, x)
        nonempty = counts > 0
        new[nonempty] /= counts[nonempty, None]
        # re-seed empty clusters from the farthest points (reference
        # kmeans.h handles empties by splitting; farthest-point is standard)
        if (~nonempty).any():
            far = np.argsort(-d[np.arange(n), assign])
            new[~nonempty] = x[far[: (~nonempty).sum()]]
        if np.allclose(new, centroids):
            centroids = new
            break
        centroids = new
    return centroids


def second_and_margin(d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Runner-up centroid and |top-2 gap| per row of an (n, n_centroids)
    distance matrix — THE one implementation.

    Overlay membership (``indexes/overlay.py``) depends on these exact
    float values, so every kernel that emits them (the ingest-fused
    assign below, the PQ encode kernel, the standalone margin scan)
    must call this helper rather than carry a copy — a tie-handling or
    sign tweak in one copy would silently desynchronize overlay
    membership between the fused and standalone paths.
    """
    two = np.argpartition(d, 1, axis=1)[:, :2]
    dv = np.take_along_axis(d, two, axis=1)
    swap = dv[:, 0] > dv[:, 1]
    second = np.where(swap, two[:, 0], two[:, 1])
    return second.astype(np.int32), np.abs(dv[:, 1] - dv[:, 0])


def assign_partitions_expr(
    vectors: DataFrame,
    centroids: np.ndarray,
    vector_col: str = VECTOR_COL,
    out_col: str = PARTITION_COL,
    vector_dtype: str = "float32",
    with_margins: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment as a broadcast numpy kernel.

    Reference ``qv_partition`` (``detail/flat/qv.h:478-523``) /
    ``kmeans_predict`` (``module.py:540-550``).  Centroids are broadcast
    (≤10k × dims — always small); assignment runs as an Arrow-batched
    mapInPandas, emitting the input row plus ``partition_id``.  No shuffle —
    the downstream ``write.partitionBy`` or ``repartition`` decides that.

    ``with_margins`` additionally emits ``__second`` (second-nearest
    centroid) and ``__margin`` (``d²(second) − d²(nearest)``) from the
    SAME distance matrix — the overlay selection's boundary signal
    (``indexes/overlay.py``), threaded through ingest so the overlay
    build never pays a second full-corpus assignment scan.  Requires
    ≥ 2 centroids (overlay builds are gated on that anyway).
    """
    import pandas as pd

    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    cols = vectors.columns
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in vectors.schema.fields
    )
    schema += f", {out_col} int"
    if with_margins:
        if centroids.shape[0] < 2:
            raise ValueError("with_margins needs >= 2 centroids")
        schema += ", __second int, __margin double"

    def assign(batches):
        from tiledb_vector_search_spark.functions.dtypes import decode_matrix

        c = bc.value
        c_sq = np.sum(c * c, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = decode_matrix(pdf[vector_col], vector_dtype)
            d = c_sq[None, :] - 2.0 * (x @ c.T)
            out = pdf.copy()
            out[out_col] = np.argmin(d, axis=1).astype(np.int32)
            if with_margins:
                second, margin = second_and_margin(d)
                out["__second"] = second
                out["__margin"] = margin
            yield out

    return vectors.mapInPandas(assign, schema=schema)
