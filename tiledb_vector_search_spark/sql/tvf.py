"""``ann_search`` — the engine's index query surface as a pure-SQL TVF.

SURVEY §4's "optional future" item: once registered, a SQL-only user runs

    SELECT * FROM ann_search(
        TABLE(SELECT query_id, vector FROM my_queries),
        '/path/to/ivf_index', 10, 4)

with no DataFrame code.  Spark distributes the query table across tasks;
each task's UDTF instance performs an IVF search for its query slice by
reading the index FILES directly with pyarrow — centroids first (tiny),
then ONLY the probed ``partition_id=P`` directories.  That is the same
partition-pruned IO the DataFrame path gets from Catalyst, obtained here
by file listing, because executors have no SparkSession to plan with.
This mirrors the reference's embedded query model (each worker owns its
own reads, ``detail/ivf/qv.h``) while Spark handles distribution of the
queries.

Scale posture: per task the work is |queries_in_task| × nprobe partition
reads — independent of total corpus size.  Best for small-to-medium query
batches; bulk dataset-vs-dataset search should use the DataFrame API's
``strategy="join"`` plans instead.

Limitations (v1, explicit): local/POSIX index paths (executor-side pyarrow
reads), un-consolidated updates are rejected (query through the DataFrame
API or ``consolidate_updates()`` first), SUM_OF_SQUARES / L2 metrics.
"""

from __future__ import annotations

import glob
import json
import os
import posixpath

import numpy as np

ANN_SEARCH_SCHEMA = "query_id long, external_id long, distance double, rank long"

_SUPPORTED_METRICS = {"sum_of_squares", "l2"}


def _read_parquet_dir(path: str, columns: list[str] | None = None):
    import pyarrow.parquet as pq

    files = sorted(glob.glob(posixpath.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    import pyarrow as pa

    tables = [pq.read_table(f, columns=columns) for f in files]
    return pa.concat_tables(tables)


def search_index_files(
    uri: str, qids: np.ndarray, qmat: np.ndarray, k: int, nprobe: int
) -> list[tuple[int, int, float, int]]:
    """IVF top-k over the on-disk index via pyarrow — no SparkSession.

    Deterministic (distance, external_id) tie-break, identical to the
    DataFrame query path's contract.
    """
    with open(posixpath.join(uri, "_index_meta.json")) as fh:
        meta = json.load(fh)
    if meta.get("index_type") != "IVF_FLAT":
        raise ValueError(
            f"ann_search TVF supports IVF_FLAT indexes; got {meta.get('index_type')}"
        )
    metric = meta.get("metric", "sum_of_squares")
    if metric not in _SUPPORTED_METRICS:
        raise ValueError(f"ann_search TVF does not support metric {metric}")
    if meta.get("update_batches"):
        raise ValueError(
            "index has un-consolidated updates; run consolidate_updates() "
            "or query through the DataFrame API"
        )
    if not meta.get("ingestions"):
        raise ValueError(f"no ingestions at {uri}")
    ts = meta["ingestions"][-1]["ts"]
    vector_dtype = meta.get("vector_dtype", "float32")

    cent_tb = _read_parquet_dir(posixpath.join(uri, "centroids", f"ts={ts}"))
    order = np.argsort(cent_tb.column("partition_id").to_numpy())
    cent_rows = cent_tb.column("centroid").to_pylist()
    centroids = np.array([cent_rows[i] for i in order], dtype=np.float64)

    # route: per query the nprobe nearest centroids, ties by partition id
    d = (
        np.sum(qmat * qmat, axis=1)[:, None]
        + np.sum(centroids * centroids, axis=1)[None, :]
        - 2.0 * (qmat @ centroids.T)
    )
    nprobe = min(nprobe, centroids.shape[0])
    base = posixpath.join(uri, "base", f"ts={ts}")
    part_queries: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        probes = np.argsort(d[qi], kind="stable")[:nprobe]
        for p in probes:
            part_queries.setdefault(int(p), []).append(qi)

    out: dict[int, list[tuple[float, int]]] = {qi: [] for qi in range(len(qids))}
    for pid, qlist in sorted(part_queries.items()):
        pdir = posixpath.join(base, f"partition_id={pid}")
        if not os.path.isdir(pdir):
            continue  # empty partition: no directory was written
        tb = _read_parquet_dir(pdir, columns=["external_id", "vector"])
        ids = tb.column("external_id").to_numpy()
        if vector_dtype == "float32":
            x = np.array(tb.column("vector").to_pylist(), dtype=np.float64)
        else:
            raw = np.frombuffer(
                b"".join(tb.column("vector").to_pylist()),
                dtype=np.uint8 if vector_dtype == "uint8" else np.int8,
            )
            x = raw.reshape(len(ids), -1).astype(np.float64)
        sub = qmat[qlist]
        dm = (
            np.sum(sub * sub, axis=1)[:, None]
            + np.sum(x * x, axis=1)[None, :]
            - 2.0 * (sub @ x.T)
        )
        np.maximum(dm, 0.0, out=dm)
        keep = min(k, dm.shape[1])
        for row, qi in enumerate(qlist):
            idx = np.lexsort((ids, dm[row]))[:keep]
            out[qi].extend((float(dm[row, j]), int(ids[j])) for j in idx)

    results: list[tuple[int, int, float, int]] = []
    sqrt = metric == "l2"
    for qi in range(len(qids)):
        merged = sorted(out[qi])[:k]
        for rank, (dist, eid) in enumerate(merged, 1):
            results.append(
                (int(qids[qi]), eid, float(np.sqrt(dist)) if sqrt else dist, rank)
            )
    return results


class AnnSearchUDTF:
    """Python UDTF: accumulate this task's query slice, search at terminate.

    ``eval`` receives one query row plus the constant (uri, k, nprobe)
    arguments; ``terminate`` runs one batched file-pruned IVF search so the
    per-partition IO amortizes over every query in the task.
    """

    def __init__(self):
        self._qids: list[int] = []
        self._qvecs: list[list[float]] = []
        self._args: tuple[str, int, int] | None = None

    def eval(self, row, uri: str, k: int, nprobe: int):
        self._qids.append(int(row.query_id))
        self._qvecs.append(list(row.vector))
        self._args = (uri, int(k), int(nprobe))

    def terminate(self):
        if not self._qids:
            return
        uri, k, nprobe = self._args
        qids = np.asarray(self._qids, dtype=np.int64)
        qmat = np.asarray(self._qvecs, dtype=np.float64)
        yield from search_index_files(uri, qids, qmat, k, nprobe)


def register_ann_search(spark, name: str = "ann_search") -> None:
    """Register the TVF on this session; returns nothing.

    After this, ``spark.sql("SELECT * FROM <name>(TABLE(...), uri, k,
    nprobe)")`` works for any SQL client of the session.
    """
    from pyspark.sql.functions import udtf

    spark.udtf.register(name, udtf(AnnSearchUDTF, returnType=ANN_SEARCH_SCHEMA))
