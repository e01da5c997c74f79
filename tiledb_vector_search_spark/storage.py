"""Index group storage: versioned Parquet + JSON metadata + updates log.

Reference storage model (SURVEY §1): a TileDB *group* directory holding the
vector arrays, an ``updates`` sparse array, and group metadata with
``ingestion_timestamps`` / ``base_sizes`` / ``partition_history``
(``index.py:900-920``, ``ingestion.py:3408-3415``).  Every array write is
timestamped and reads accept a timestamp for time travel
(``index.py:115-177``).

Spark-native re-expression (no Delta in this environment, so the versioning
is explicit):

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

Portability: every filesystem operation goes through the Hadoop FileSystem
API (``spark._jvm.org.apache.hadoop.fs``), so an index URI may live on any
Hadoop-supported store (local, HDFS, s3a://, gs://, abfs://) — the 100 TB
deployment target.  No driver-local ``os.path``/``shutil`` on data paths.
"""

from __future__ import annotations

import functools
import json
import posixpath
import time
import uuid
from contextlib import contextmanager
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiledb_vector_search_spark.schemas import ID_COL, UPDATES_SCHEMA, VECTOR_COL

META_FILE = "_index_meta.json"
STORAGE_VERSION = "spark-0.3"


class ConcurrentWriterError(RuntimeError):
    """Another writer flipped an artifact's meta pointer mid-mutation.

    The persisted artifacts (``BM25Index``, ``MinHashReference``) are
    SINGLE-WRITER: every mutation is a read-modify-write of the meta
    pointer, so two interleaved writers can mint the same batch id and
    the later flip silently drops the earlier batch.  The fence turns
    that silent data loss into this error on the losing side.
    """


def fenced_meta_flip(
    fs: "HadoopFS",
    meta_path: str,
    new_meta: dict[str, Any],
    expected_version: int,
) -> dict[str, Any]:
    """Commit ``new_meta`` atomically IF the on-disk meta is still at
    ``expected_version`` — the writer fence for single-writer artifacts.

    The reference sidesteps concurrent-writer loss only because TileDB
    fragments are append-immutable; a pointer-flip layout needs an
    explicit fence.  Two checks bracket the atomic rename:

    1. PRE-CHECK: re-read the on-disk meta immediately before the flip;
       if its ``meta_version`` moved past what this handle last
       observed, another writer committed in between — raise, leaving
       this mutation's staged ``batch=`` dirs as invisible orphans (no
       reader resolves them; the winner's commit is untouched).
    2. POST-VERIFY: re-read after the rename and check the fresh
       ``writer_nonce`` landed.  This catches a competing flip that
       lands between the pre-check and this writer's own re-read: the
       LAST rename wins the file and the earlier writer sees a foreign
       nonce and raises.

    HONEST LIMIT: the fence is not a CAS, so one symmetric interleave
    still loses silently — both writers pre-check at the same version,
    writer A renames AND post-verifies (sees its own nonce, returns
    success) entirely inside the window between B's pre-check and B's
    rename; B then renames and also verifies clean.  Both calls report
    success and A's batch is dropped.  That window is closed one layer
    UP by :func:`writer_lease` (every artifact mutation holds the
    atomic-create lock, so two writers are never inside the
    read-modify-write at once) on stores with an atomic create —
    POSIX O_EXCL, HDFS create-no-overwrite.  On object stores without
    one (plain S3 PUT), the lease is advisory and this fence is the
    remaining guarantee: the realistic zombie-writer scenario — a
    stale driver whose handle predates the new writer's commits by
    seconds or more — always raises instead of silently clobbering,
    and any loss window is the sub-second span of a single competing
    commit, not the zombie's whole staleness.

    Returns the committed meta (``meta_version`` bumped, fresh
    ``writer_nonce``) for the caller to adopt as its in-memory state.
    """
    on_disk = json.loads(fs.read_text(meta_path))
    disk_version = int(on_disk.get("meta_version", 0))
    if disk_version != expected_version:
        raise ConcurrentWriterError(
            f"meta at {meta_path} is at version {disk_version}, but this "
            f"writer last observed version {expected_version}: another "
            "writer committed in between.  The artifact is single-writer "
            "— re-open a fresh handle to see the other writer's commits, "
            "and sequence mutations through one writer."
        )
    nonce = uuid.uuid4().hex
    committed = {
        **new_meta,
        "meta_version": disk_version + 1,
        "writer_nonce": nonce,
    }
    fs.write_text_atomic(meta_path, json.dumps(committed))
    check = json.loads(fs.read_text(meta_path))
    if check.get("writer_nonce") != nonce:
        raise ConcurrentWriterError(
            f"meta at {meta_path} was overwritten by a concurrent writer "
            "DURING this commit (post-write nonce mismatch): this batch "
            "was dropped by the competing flip.  Re-open a fresh handle "
            "and retry against the surviving state."
        )
    return committed


WRITER_LOCK_FILE = "_writer_lock"
# generous by design: the lease guards WHOLE mutations (Spark jobs
# included), and a live writer outlasting its TTL would expose it to
# takeover — so the TTL is sized for the slowest plausible increment,
# not the common case.  The meta fence stays underneath as the
# backstop for anything the lease misses.
DEFAULT_LEASE_TTL_MS = 10 * 60 * 1000


@contextmanager
def writer_lease(
    fs: "HadoopFS", artifact_uri: str, ttl_ms: int = DEFAULT_LEASE_TTL_MS
):
    """Mutual exclusion for artifact mutations: an atomic-create lock
    file — the store-CAS approximation that closes the meta fence's
    documented symmetric-interleave window on stores with an atomic
    create (POSIX O_EXCL locally, HDFS create-no-overwrite).

    The fence (:func:`fenced_meta_flip`) detects a competing commit at
    the flip; this lease PREVENTS two writers from being inside a
    mutation at all, so the fence's sub-second silent-loss interleave
    cannot start.  It also serializes ``vacuum_orphans`` against live
    mutations — without it, a vacuum racing an in-flight add could
    reclaim the add's staged dirs moments before their commit.

    Protocol: atomically create ``_writer_lock`` (nonce + acquire time
    + TTL).  If it exists: a FRESH holder raises
    ``ConcurrentWriterError``; a STALE one (older than its TTL — a
    crashed writer, which cannot release) is deleted and re-claimed,
    where the atomic create arbitrates concurrent takeovers (both
    delete, exactly one create wins).  Release deletes the lock only if
    it still carries our nonce.  On object stores without an atomic
    create the lock degrades to advisory and the meta fence remains
    the guarantee — same honesty boundary as before, now one layer
    narrower.
    """
    path = posixpath.join(artifact_uri, WRITER_LOCK_FILE)
    nonce = uuid.uuid4().hex
    payload = json.dumps(
        {"nonce": nonce, "acquired_ms": now_ms(), "ttl_ms": int(ttl_ms)}
    )
    if not fs.create_exclusive(path, payload):
        try:
            held = json.loads(fs.read_text(path))
        except Exception:
            held = {}  # empty/corrupt lock (crash mid-claim) = stale
        age = now_ms() - int(held.get("acquired_ms", 0))
        if held and age <= int(held.get("ttl_ms", ttl_ms)):
            raise ConcurrentWriterError(
                f"another writer holds the mutation lease on "
                f"{artifact_uri} (age {age} ms, ttl "
                f"{held.get('ttl_ms', ttl_ms)} ms).  The artifact is "
                "single-writer: sequence mutations through one writer, "
                "or wait for the holder to finish.  A crashed holder's "
                "lease expires after its TTL."
            )
        fs.delete(path, recursive=False)
        if not fs.create_exclusive(path, payload):
            raise ConcurrentWriterError(
                f"lost the lease takeover race on {artifact_uri}: "
                "another writer re-claimed the expired lock first."
            )
    try:
        yield
    finally:
        try:
            held = json.loads(fs.read_text(path))
            if held.get("nonce") == nonce:
                fs.delete(path, recursive=False)
        except Exception:
            pass  # lock already gone or taken over — nothing to release


def locked_mutation(fn):
    """Decorator serializing an artifact mutation method under
    :func:`writer_lease`.  The instance must expose ``spark`` and
    ``uri`` (the ``BM25Index`` / ``MinHashReference`` contract)."""

    @functools.wraps(fn)
    def wrapper(self, *args: Any, **kwargs: Any):
        fs = HadoopFS(self.spark, self.uri)
        with writer_lease(fs, self.uri):
            return fn(self, *args, **kwargs)

    return wrapper


# every layout this reader understands (reference analogue:
# ``storage_formats.py:3-48`` keeps one entry per released layout and
# ``test_backwards_compatibility.py`` reads them all).  spark-0.1 wrote the
# same parquet group shape; 0.2 added optional meta fields only; 0.3
# switched IVF_PQ to coarse-residual PQ codes (meta flag ``pq_residual``
# — absent/false in older indexes, which still read via the raw-code
# scorer).
SUPPORTED_STORAGE_VERSIONS = {"spark-0.1", "spark-0.2", "spark-0.3"}


def now_ms() -> int:
    return int(time.time() * 1000)


class HadoopFS:
    """Thin wrapper over org.apache.hadoop.fs.FileSystem for one base URI."""

    def __init__(self, spark: SparkSession, uri: str):
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(uri).getFileSystem(self._conf)

    def _rename_overwrite(self, src, dst) -> bool:
        """Atomic overwrite-rename via FileContext (HDFS / local): the
        destination is replaced in ONE namespace operation — no window
        where it does not exist.  Returns False when the FS (or the
        rename itself, e.g. onto a non-empty directory) doesn't support
        it, so callers can fall back to delete-then-rename."""
        try:
            jvm = self._jvm
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._fs.getUri(), self._conf
            )
            opts = self._gateway.new_array(
                jvm.org.apache.hadoop.fs.Options.Rename, 1
            )
            opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
            fc.rename(src, dst, opts)
            return True
        except Exception:
            return False

    def _p(self, path: str):
        return self._Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(self._fs.getFileStatus(p).isDirectory())

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, path: str, content: str) -> None:
        self.write_bytes_atomic(path, content.encode("utf-8"))

    def write_bytes_atomic(self, path: str, content: bytes) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(content))
        finally:
            out.close()
        target = self._p(path)
        if self._rename_overwrite(self._p(tmp), target):
            return
        # fallback for filesystems without FileContext overwrite-rename:
        # delete-then-rename has a window where the target is missing —
        # a concurrent reader can see FileNotFound and a crash inside it
        # loses the file (only the .tmp survives).  The primary path
        # above has no such window on HDFS/local.
        if self._fs.exists(target):
            self._fs.delete(target, False)
        if not self._fs.rename(self._p(tmp), target):
            raise IOError(f"rename {tmp} -> {path} failed")

    def create_exclusive(self, path: str, content: str) -> bool:
        """Create ``path`` IF ABSENT; False when it already exists.

        Atomic where the store supports it: local paths go through
        ``java.nio.Files.createFile`` (O_CREAT|O_EXCL — Hadoop's
        RawLocalFileSystem check-then-create is NOT atomic); other
        schemes use ``FileSystem.create(overwrite=false)``, a single
        namespace op on HDFS.  The content lands after the claim, so a
        crash between the two leaves an EMPTY lock — readers treat
        empty/corrupt as stale by construction.
        """
        p = self._p(path)
        scheme = self._fs.getUri().getScheme()
        if scheme in (None, "file"):
            jnio = self._jvm.java.nio.file
            try:
                # java.io.File(...).toPath() avoids the Paths.get varargs
                jnio.Files.createFile(
                    self._jvm.java.io.File(p.toUri().getPath()).toPath(),
                    self._gateway.new_array(
                        self._jvm.java.nio.file.attribute.FileAttribute, 0
                    ),
                )
            except Exception:
                return False
        else:
            try:
                out = self._fs.create(p, False)
                out.close()
            except Exception:
                return False
        # claimed: write the payload in place (we own the file)
        out = self._fs.create(p, True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()
        return True

    def read_bytes(self, path: str) -> bytes:
        stream = self._fs.open(self._p(path))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def delete(self, path: str, recursive: bool = True) -> bool:
        p = self._p(path)
        if not self._fs.exists(p):
            return False
        return bool(self._fs.delete(p, recursive))

    def rename(self, src: str, dst: str) -> None:
        dst_p = self._p(dst)
        if self._fs.exists(dst_p):
            self._fs.delete(dst_p, True)
        if not self._fs.rename(self._p(src), dst_p):
            raise IOError(f"rename {src} -> {dst} failed")

    def listdir(self, path: str) -> list[str]:
        if not self.exists(path):
            return []
        return [
            s.getPath().getName() for s in self._fs.listStatus(self._p(path))
        ]

    def count_files(self, path: str, suffix: str | None = None) -> int:
        """Number of plain files under ``path`` (recursive)."""
        if not self.exists(path):
            return 0
        it = self._fs.listFiles(self._p(path), True)
        n = 0
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if suffix is None or name.endswith(suffix):
                n += 1
        return n


class IndexStorage:
    """Group layout + metadata transactions for one index, via Hadoop FS."""

    def __init__(self, spark: SparkSession, uri: str):
        self.spark = spark
        self.uri = uri.rstrip("/")
        self.fs = HadoopFS(spark, self.uri)

    # -- metadata ------------------------------------------------------------

    @property
    def meta_path(self) -> str:
        return posixpath.join(self.uri, META_FILE)

    def exists(self) -> bool:
        return self.fs.exists(self.meta_path)

    def read_meta(self) -> dict[str, Any]:
        if not self.exists():
            raise FileNotFoundError(f"no index at {self.uri}")
        meta = json.loads(self.fs.read_text(self.meta_path))
        ver = meta.get("storage_version")
        if ver not in SUPPORTED_STORAGE_VERSIONS:
            raise ValueError(
                f"index at {self.uri} has storage_version {ver!r}; this "
                f"build reads {sorted(SUPPORTED_STORAGE_VERSIONS)} — "
                "upgrade the library to open newer layouts"
            )
        return meta

    def write_meta(self, meta: dict[str, Any]) -> None:
        self.fs.write_text_atomic(
            self.meta_path, json.dumps(meta, indent=2, sort_keys=True)
        )

    def init_meta(self, **fields: Any) -> dict[str, Any]:
        meta = {
            "storage_version": STORAGE_VERSION,
            "ingestions": [],  # [{ts, base_size, partitions}]
            "update_batches": [],  # ts of each appended updates batch
            "log_compacted_batches": 0,  # batches covered by last compaction
            **fields,
        }
        self.write_meta(meta)
        return meta

    # -- base snapshots ------------------------------------------------------

    def base_path(self, ts: int) -> str:
        return posixpath.join(self.uri, "base", f"ts={ts}")

    def centroids_path(self, ts: int) -> str:
        return posixpath.join(self.uri, "centroids", f"ts={ts}")

    def aux_path(self, name: str, ts: int) -> str:
        return posixpath.join(self.uri, "aux", name, f"ts={ts}")

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
        return posixpath.join(self.uri, "updates")

    def append_updates(self, df: DataFrame, ts: int) -> None:
        # pin the log schema regardless of literal magnitudes upstream:
        # F.lit(small_ts) infers IntegerType, and a log whose batches
        # mix int32/int64 ts files fails the merged parquet read
        df = df.withColumn("ts", F.col("ts").cast("long")).withColumn(
            "is_delete", F.col("is_delete").cast("boolean")
        )
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
        batches = self.read_meta()["update_batches"]
        if not batches:
            return self.spark.createDataFrame([], UPDATES_SCHEMA)
        # the meta flip is the COMMIT POINT: a batch whose parquet
        # append landed but whose meta write crashed must stay
        # invisible (describe/has_updates already consult the list —
        # without this filter, readers applied updates the metadata
        # says do not exist).  Orphan rows get dropped for good at the
        # next clear_updates_through rewrite.
        return self.spark.read.parquet(self.updates_path).where(
            F.col("ts").isin([int(t) for t in batches])
        )

    def read_updates(
        self, lo_exclusive: int | None, hi_inclusive: int | None
    ) -> DataFrame:
        """Latest update per external_id within the (lo, hi] window.

        The reference's sparse updates array resolves overlapping fragments
        newest-wins at read (``index.py:792-814``); here that is an explicit
        latest-per-key window.

        Same-``ts`` conflicts resolve DETERMINISTICALLY: a single
        ``merge_batch`` micro-batch stamps every row with one ts, so an
        upsert and a tombstone for the same id can tie.  Precedence: the
        upsert wins (``is_delete`` ascending) — matching the semantics of
        issuing the delete first and the upsert at a later ts, which is
        what the equivalent two-call sequence produces.  A final ordering
        on the vector value itself (Spark arrays compare element-wise
        lexicographically) makes the pick stable even if one batch
        carries two different upserts for the same id — and, unlike a
        hash key, is exactly mirrorable by the SQL TVF's pyarrow/numpy
        twin (``sql/tvf.py:_load_updates``), which must resolve the log
        identically.
        """
        df = self.read_updates_raw()
        if lo_exclusive is not None:
            df = df.where(F.col("ts") > lo_exclusive)
        if hi_inclusive is not None:
            df = df.where(F.col("ts") <= hi_inclusive)
        w = Window.partitionBy(ID_COL).orderBy(
            F.col("ts").desc(),
            F.col("is_delete").asc(),
            F.col(VECTOR_COL).asc_nulls_last(),
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .drop("__rn")
        )

    def compact_updates_log(self) -> None:
        """Rewrite the log directory into a small file footprint.

        Physical-layout change only: every row keeps its ``ts`` and the
        logical ``update_batches`` list is preserved, so timestamped opens
        (< max ts) still see exactly the batches in their window.
        """
        meta = self.read_meta()
        if not meta["update_batches"]:
            return
        raw = self.read_updates_raw().cache()
        n = raw.count()
        tmp = f"{self.updates_path}.tmp.{uuid.uuid4().hex}"
        raw.coalesce(max(1, n // 500_000 + 1)).write.parquet(tmp)
        raw.unpersist()
        self.fs.rename(tmp, self.updates_path)
        meta = self.read_meta()
        meta["log_compacted_batches"] = len(meta["update_batches"])
        self.write_meta(meta)

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
        self.fs.delete(self.updates_path)
        if keep is not None and remaining:
            self.fs.rename(tmp, self.updates_path)
        if keep is not None:
            keep.unpersist()
        meta["update_batches"] = remaining
        meta["log_compacted_batches"] = 0
        self.write_meta(meta)

    # -- history management --------------------------------------------------

    def vacuum(self, keep_latest: int = 1) -> list[int]:
        """Drop all but the newest ``keep_latest`` base snapshots.

        Reference: fragment consolidation + vacuum (``index.py:579-598``,
        ``ingestion.py:3014-3063``).
        """
        meta = self.read_meta()
        if len(meta["ingestions"]) <= keep_latest:
            return []
        drop = meta["ingestions"][:-keep_latest]
        aux_names = self.fs.listdir(posixpath.join(self.uri, "aux"))
        for e in drop:
            self.fs.delete(self.base_path(e["ts"]))
            self.fs.delete(self.centroids_path(e["ts"]))
            for name in aux_names:
                self.fs.delete(self.aux_path(name, e["ts"]))
        meta["ingestions"] = meta["ingestions"][-keep_latest:]
        self.write_meta(meta)
        return [e["ts"] for e in drop]

    def delete_index(self) -> None:
        self.fs.delete(self.uri)
