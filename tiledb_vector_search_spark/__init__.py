"""tiledb_vector_search_spark — a PySpark-native vector analytics engine.

A brand-new engine with the query and data-processing capabilities of
TileDB-Inc/TileDB-Vector-Search (reference at /root/reference, read-only),
re-expressed Spark-first: DataFrame/SQL logical plans, Catalyst physical
planning, partitioned Parquet storage, Arrow-vectorized pandas UDF kernels
where the built-in operators can't express the semantics (distance batch
kernels, PQ encode/decode).

Public surface (mirrors the reference's ``tiledb.vector_search`` package):

- :mod:`.indexes` — ``FlatIndex``, ``IVFFlatIndex``, ``IVFPQIndex``
  (reference: ``apis/python/src/tiledb/vector_search/{flat,ivf_flat,ivf_pq}_index.py``)
- :mod:`.operators.knn` — the k-NN plan builders (brute force, IVF-routed)
- :mod:`.operators.dedup` — LLM-data-pipeline dedup (exact, minhash-LSH,
  simhash, n-gram jaccard, embedding near-dup)
- :mod:`.functions` — distance/vector/text column functions
- :mod:`.storage` — index group storage, updates log, time travel
  (reference: ``index.py`` timestamp semantics)
"""

from tiledb_vector_search_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
