"""Driver-side parquet I/O for SMALL index artifacts.

Centroid tables, PQ codebooks, medoids and single-call DML batches are
driver-resident by construction (bounded numpy arrays / short python
lists — they never scale with the corpus, only with k or the batch
size).  Writing one through a Spark job costs a full job round-trip —
scheduling, a task launch, a Python-worker hop, commit protocol —
~100-500 ms of fixed overhead per artifact on local[32] and a driver→
cluster round-trip on a real deployment.  The same table written with
pyarrow on the driver costs ~1 ms and produces parquet that
``spark.read.parquet`` reads identically (verified by
tests/test_driver_io.py round-trips).

The fast path applies ONLY to local filesystem URIs (``file:`` or
schemeless).  Remote URIs (hdfs://, s3a://, ...) fall back to the
Spark writer, so the storage abstraction holds everywhere; the local
fast path is what the bench and every sandbox deployment exercise.

This is an I/O mechanism change, not a semantic one: artifact bytes are
recomputed on every call from the live inputs, file layout stays "a
directory of parquet part files", and the meta-flip commit protocol
around these writes is untouched.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

_SPARK_TO_ARROW = {
    "int": pa.int32(),
    "integer": pa.int32(),
    "long": pa.int64(),
    "bigint": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "boolean": pa.bool_(),
    "string": pa.string(),
    "binary": pa.binary(),
}


def local_os_path(path: str) -> str | None:
    """OS path for a local URI (``file:`` scheme or schemeless), else None."""
    if path.startswith("file://"):
        rest = path[len("file://") :]
        # file:///abs/path and file://localhost/abs/path both resolve
        # locally; any other authority is a remote mount we won't guess at
        if rest.startswith("/"):
            return rest
        if rest.startswith("localhost/"):
            return rest[len("localhost") :]
        return None
    if path.startswith("file:"):
        return path[len("file:") :]
    if "://" in path.split("/", 1)[0] or ":" in path.split("/", 1)[0]:
        # some other scheme (hdfs:, s3a:, ...)
        return None
    return path


def _split_ddl(ddl: str) -> list[tuple[str, str]]:
    cols: list[tuple[str, str]] = []
    depth = 0
    cur = ""
    parts: list[str] = []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    for p in parts:
        name, typ = p.strip().split(None, 1)
        cols.append((name, typ.strip().lower()))
    return cols


def _arrow_type(spark_type: str) -> pa.DataType:
    t = spark_type.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return pa.list_(_arrow_type(t[len("array<") : -1]))
    try:
        return _SPARK_TO_ARROW[t]
    except KeyError:
        raise ValueError(f"driver_io: unsupported spark type {spark_type!r}")


def ddl_to_arrow_schema(ddl: str) -> pa.Schema:
    return pa.schema([(n, _arrow_type(t)) for n, t in _split_ddl(ddl)])


def rows_to_table(rows: list, ddl: str) -> pa.Table:
    schema = ddl_to_arrow_schema(ddl)
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    arrays = [
        pa.array(list(col), type=f.type) for col, f in zip(cols, schema)
    ]
    return pa.Table.from_arrays(arrays, schema=schema)


def _write_table(table: pa.Table, os_dir: str) -> None:
    part = os.path.join(
        os_dir, f"part-00000-{uuid.uuid4().hex}-c000.zstd.parquet"
    )
    pq.write_table(table, part, compression="zstd")


def write_small_parquet(spark, path: str, rows: list, ddl: str) -> None:
    """Write driver-side ``rows`` as one parquet file under ``path``.

    Local path: direct pyarrow write, NO Spark job.  Remote: single-slice
    Spark write (the pre-existing behavior).  Mirrors the default
    ``errorifexists`` Spark write mode: the target must not exist yet.
    """
    os_dir = local_os_path(path)
    if os_dir is None:
        from tiledb_vector_search_spark.session import small_df

        small_df(spark, rows, ddl).write.parquet(path)
        return
    os.makedirs(os_dir, exist_ok=False)
    _write_table(rows_to_table(rows, ddl), os_dir)


def append_small_parquet(spark, path: str, rows: list, ddl: str) -> None:
    """Append driver-side ``rows`` as a new parquet file under ``path``
    (parquet-directory append semantics — one new uniquely-named file)."""
    os_dir = local_os_path(path)
    if os_dir is None:
        from tiledb_vector_search_spark.session import small_df

        small_df(spark, rows, ddl).write.mode("append").parquet(path)
        return
    os.makedirs(os_dir, exist_ok=True)
    _write_table(rows_to_table(rows, ddl), os_dir)


def read_small_rows(spark, path: str, order_by: tuple = ()) -> list[dict]:
    """All rows of a SMALL artifact table as a list of dicts, ordered by
    ``order_by``.  Local paths read via pyarrow on the driver (no Spark
    job — these are bounded driver artifacts: centroids, codebooks,
    medoids); remote URIs fall back to the Spark reader."""
    t = read_small_parquet(path)
    if t is not None:
        pdf = t.to_pandas()
        if order_by:
            # stable sort: ties (none in practice — keys are unique)
            # keep file order, matching Spark's sort for unique keys
            pdf = pdf.sort_values(list(order_by), kind="mergesort")
        return pdf.to_dict("records")
    df = spark.read.parquet(path)
    if order_by:
        df = df.orderBy(*order_by)
    return [r.asDict() for r in df.collect()]


def read_small_parquet(path: str) -> pa.Table | None:
    """Whole-directory pyarrow read for local paths, else None (caller
    falls back to the Spark reader).  Returns an empty-schema table for
    an existing-but-empty directory."""
    os_dir = local_os_path(path)
    if os_dir is None or not os.path.exists(os_dir):
        return None
    try:
        return pq.read_table(os_dir)
    except Exception:
        return None
