"""Index group storage: versioned Parquet + JSON metadata + updates log.

Reference storage model (SURVEY §1): a TileDB *group* directory holding the
vector arrays, an ``updates`` sparse array, and group metadata with
``ingestion_timestamps`` / ``base_sizes`` / ``partition_history``
(``index.py:900-920``, ``ingestion.py:3408-3415``).  Every array write is
timestamped and reads accept a timestamp for time travel
(``index.py:115-177``).

Spark-native re-expression (no Delta in this environment, so the versioning
is explicit and trivially portable to object stores):

``uri/``
  ``_index_meta.json``      — group metadata (atomic tmp+rename)
  ``base/ts=<ts>/``         — one immutable Parquet snapshot per ingestion,
                              optionally ``partitionBy(partition_id)``
  ``centroids/ts=<ts>/``    — IVF centroids per ingestion
  ``aux/<name>/ts=<ts>/``   — per-index auxiliary tables (PQ codebooks, ...)
  ``updates/``              — append-only Parquet log of upserts/tombstones

Time travel: ``resolve_base_ts(t)`` picks the newest ingestion ≤ t (same
rule as ``index.py:115-177``); the updates overlay is the log rows with
``base_ts < ts <= t``.  Consolidation folds the overlay into a new base
snapshot at a new timestamp — old snapshots remain queryable until
``vacuum``/``clear_history`` (``index.py:579-735``).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiledb_vector_search_spark.schemas import ID_COL, UPDATES_SCHEMA

META_FILE = "_index_meta.json"
STORAGE_VERSION = "spark-0.1"


def now_ms() -> int:
    return int(time.time() * 1000)


class IndexStorage:
    """Filesystem layout + metadata transactions for one index group."""

    def __init__(self, spark: SparkSession, uri: str):
        self.spark = spark
        self.uri = uri.rstrip("/")

    # -- metadata ------------------------------------------------------------

    @property
    def meta_path(self) -> str:
        return os.path.join(self.uri, META_FILE)

    def exists(self) -> bool:
        return os.path.exists(self.meta_path)

    def read_meta(self) -> dict[str, Any]:
        with open(self.meta_path) as f:
            return json.load(f)

    def write_meta(self, meta: dict[str, Any]) -> None:
        os.makedirs(self.uri, exist_ok=True)
        tmp = f"{self.meta_path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self.meta_path)

    def init_meta(self, **fields: Any) -> dict[str, Any]:
        meta = {
            "storage_version": STORAGE_VERSION,
            "ingestions": [],  # [{ts, base_size, partitions}]
            "update_batches": [],  # ts of each appended updates batch
            **fields,
        }
        self.write_meta(meta)
        return meta

    # -- base snapshots ------------------------------------------------------

    def base_path(self, ts: int) -> str:
        return os.path.join(self.uri, "base", f"ts={ts}")

    def centroids_path(self, ts: int) -> str:
        return os.path.join(self.uri, "centroids", f"ts={ts}")

    def aux_path(self, name: str, ts: int) -> str:
        return os.path.join(self.uri, "aux", name, f"ts={ts}")

    def write_base(
        self,
        df: DataFrame,
        ts: int,
        partition_by: str | None = None,
        extra_meta: dict[str, Any] | None = None,
        base_size: int | None = None,
    ) -> None:
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(self.base_path(ts))
        meta = self.read_meta()
        entry = {"ts": ts, "base_size": base_size, **(extra_meta or {})}
        meta["ingestions"].append(entry)
        meta["ingestions"].sort(key=lambda e: e["ts"])
        self.write_meta(meta)

    def read_base(self, ts: int) -> DataFrame:
        return self.spark.read.parquet(self.base_path(ts))

    def resolve_base_ts(self, timestamp: int | None) -> int | None:
        """Newest ingestion ts ≤ timestamp (reference ``index.py:115-177``)."""
        ing = self.read_meta()["ingestions"]
        if not ing:
            return None
        if timestamp is None:
            return ing[-1]["ts"]
        ok = [e["ts"] for e in ing if e["ts"] <= timestamp]
        return max(ok) if ok else None

    # -- updates log ---------------------------------------------------------

    @property
    def updates_path(self) -> str:
        return os.path.join(self.uri, "updates")

    def append_updates(self, df: DataFrame, ts: int) -> None:
        df.write.mode("append").parquet(self.updates_path)
        meta = self.read_meta()
        meta["update_batches"].append(ts)
        self.write_meta(meta)

    def has_updates(self, lo_exclusive: int | None, hi_inclusive: int | None) -> bool:
        return any(
            (lo_exclusive is None or t > lo_exclusive)
            and (hi_inclusive is None or t <= hi_inclusive)
            for t in self.read_meta()["update_batches"]
        )

    def read_updates_raw(self) -> DataFrame:
        if not self.read_meta()["update_batches"]:
            return self.spark.createDataFrame([], UPDATES_SCHEMA)
        return self.spark.read.parquet(self.updates_path)

    def read_updates(
        self, lo_exclusive: int | None, hi_inclusive: int | None
    ) -> DataFrame:
        """Latest update per external_id within the (lo, hi] window.

        The reference's sparse updates array resolves overlapping fragments
        newest-wins at read (``index.py:792-814``); here that is an explicit
        latest-per-key window.
        """
        df = self.read_updates_raw()
        if lo_exclusive is not None:
            df = df.where(F.col("ts") > lo_exclusive)
        if hi_inclusive is not None:
            df = df.where(F.col("ts") <= hi_inclusive)
        w = Window.partitionBy(ID_COL).orderBy(F.col("ts").desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .drop("__rn")
        )

    def clear_updates_through(self, ts: int) -> None:
        """Drop consolidated updates ≤ ts (rewrite the log without them)."""
        meta = self.read_meta()
        remaining = [t for t in meta["update_batches"] if t > ts]
        keep = None
        if meta["update_batches"]:
            keep = self.read_updates_raw().where(F.col("ts") > ts)
            keep = keep.cache()
            keep.count()
        tmp = f"{self.updates_path}.tmp.{uuid.uuid4().hex}"
        if keep is not None and remaining:
            keep.write.parquet(tmp)
        import shutil

        if os.path.exists(self.updates_path):
            shutil.rmtree(self.updates_path)
        if keep is not None and remaining:
            os.replace(tmp, self.updates_path)
        if keep is not None:
            keep.unpersist()
        meta["update_batches"] = remaining
        self.write_meta(meta)

    # -- history management --------------------------------------------------

    def vacuum(self, keep_latest: int = 1) -> list[int]:
        """Drop all but the newest ``keep_latest`` base snapshots.

        Reference: fragment consolidation + vacuum (``index.py:579-598``,
        ``ingestion.py:3014-3063``).
        """
        import shutil

        meta = self.read_meta()
        if len(meta["ingestions"]) <= keep_latest:
            return []
        drop = meta["ingestions"][:-keep_latest]
        for e in drop:
            for p in (
                self.base_path(e["ts"]),
                self.centroids_path(e["ts"]),
            ):
                if os.path.exists(p):
                    shutil.rmtree(p)
            aux_root = os.path.join(self.uri, "aux")
            if os.path.isdir(aux_root):
                for name in os.listdir(aux_root):
                    p = self.aux_path(name, e["ts"])
                    if os.path.exists(p):
                        shutil.rmtree(p)
        meta["ingestions"] = meta["ingestions"][-keep_latest:]
        self.write_meta(meta)
        return [e["ts"] for e in drop]

    def delete_index(self) -> None:
        import shutil

        if os.path.exists(self.uri):
            shutil.rmtree(self.uri)
