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
import threading
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

    The persisted artifacts (``BM25Index``, ``MinHashReference``) AND
    every ANN index (``IndexStorage`` meta) are SINGLE-WRITER: every
    mutation is a read-modify-write of the meta pointer, so two
    interleaved writers can silently drop each other's committed batch
    — and because index reads filter to the meta-committed batch list,
    a dropped ``update_batches`` entry leaves that batch's parquet rows
    permanently invisible.  The fence (:func:`fenced_meta_flip`, used
    by every ``IndexStorage.commit_meta``) turns that silent data loss
    into this error on the losing side; the lease
    (:func:`writer_lease`, held by every mutation method) prevents the
    overlap from starting at all.
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
    with _timed_enforcement():
        return _fenced_meta_flip_inner(fs, meta_path, new_meta, expected_version)


def _fenced_meta_flip_inner(
    fs: "HadoopFS",
    meta_path: str,
    new_meta: dict[str, Any],
    expected_version: int,
) -> dict[str, Any]:
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


# wall-time spent INSIDE concurrency enforcement (lease claim/release +
# fenced meta flips) — never inside the guarded mutation itself.  The
# bench harness snapshots this around each sample to decompose a row's
# cost into work vs enforced-safety overhead (VERDICT r9 item 6: the
# streaming ingest rows' level shift needed attribution, not prose).
ENFORCEMENT_COUNTERS = {"ns": 0, "ops": 0}


@contextmanager
def _timed_enforcement():
    t0 = time.perf_counter_ns()
    try:
        yield
    finally:
        ENFORCEMENT_COUNTERS["ns"] += time.perf_counter_ns() - t0
        ENFORCEMENT_COUNTERS["ops"] += 1


WRITER_LOCK_FILE = "_writer_lock"
# generous by design: the lease guards WHOLE mutations (Spark jobs
# included), and a live writer outlasting its TTL would expose it to
# takeover — so the TTL is sized for the slowest plausible increment,
# not the common case.  The meta fence stays underneath as the
# backstop for anything the lease misses.
DEFAULT_LEASE_TTL_MS = 10 * 60 * 1000
# consolidation-class mutations (full corpus rewrites whose Spark jobs
# can legitimately run long): sized so a live fold is never exposed to
# takeover.  Holders can also renew() mid-mutation.
LONG_LEASE_TTL_MS = 60 * 60 * 1000

# leases held by THIS thread, keyed by artifact uri — makes the lease
# re-entrant within one writer (e.g. ``consolidate_updates`` measuring
# the recall curve on the fresh handle mid-fold), while two THREADS in
# one process still exclude each other like any two writers.
_held_leases = threading.local()


class LeaseHandle:
    """The held lease: long-running mutations call :meth:`renew`
    periodically so a live hold never crosses its TTL (takeover
    eligibility is ``now - acquired_ms > ttl_ms``; renewal re-stamps
    ``acquired_ms`` under the held nonce).  A renew while the last
    disk stamp is provably fresh (< ¼ TTL, capped at 2 s) is an
    in-memory no-op — see :data:`RENEW_FRESH_WINDOW_MS_CAP`;
    ``renew(force=True)`` always round-trips the disk."""

    # a renew within this window of the last DISK stamp is a no-op: a
    # LEGAL takeover requires the stamp to cross its full TTL first, so
    # while the stamp is provably fresh there is nothing a disk
    # round-trip could learn (the ≤½-TTL margin absorbs clock-rate
    # skew).  A PROTOCOL-VIOLATING thief (overwriting a fresh lock) is
    # caught at the next disk stamp — bounded by this window — or, for
    # any commit in between, by the meta fence, which remains the
    # silent-loss backstop.  Sized so per-mutation renews inside one
    # streaming micro-batch cost a clock read, not 3 FS round-trips
    # (measured 0.16→0.38 s/run enforcement when every mutation paid
    # the hardened read+write+verify renew).
    RENEW_FRESH_WINDOW_MS_CAP = 2000.0

    def __init__(self, fs: "HadoopFS", path: str, nonce: str, ttl_ms: int):
        self._fs = fs
        self.path = path
        self.nonce = nonce
        self.ttl_ms = int(ttl_ms)
        # the claim that minted this handle just stamped the lock
        self._stamped_at = time.monotonic()
        self._stamped_ttl_ms = int(ttl_ms)

    def renew(self, force: bool = False) -> None:
        elapsed_ms = (time.monotonic() - self._stamped_at) * 1000.0
        # the expiry refusal runs BEFORE the freshness short-circuit: a
        # hold past its TTL is takeover-eligible and must fail here
        # regardless of disk state (the in-memory stamp only ever LAGS
        # the disk stamp, so this check is conservative)
        if elapsed_ms > self.ttl_ms:
            raise ConcurrentWriterError(
                f"lease at {self.path} expired before renew() — the "
                "hold is takeover-eligible and a late re-stamp could "
                "clobber a contender's fresh claim.  Renew before the "
                "TTL elapses (or size ttl_ms for the mutation)."
            )
        if (
            not force
            and int(self.ttl_ms) == self._stamped_ttl_ms
            and elapsed_ms < min(self.ttl_ms / 4.0, self.RENEW_FRESH_WINDOW_MS_CAP)
        ):
            return
        try:
            held = json.loads(self._fs.read_text(self.path))
        except Exception as exc:
            raise ConcurrentWriterError(
                f"lease at {self.path} disappeared mid-mutation "
                "(taken over or externally deleted) — this writer no "
                "longer holds it"
            ) from exc
        if held.get("nonce") != self.nonce:
            raise ConcurrentWriterError(
                f"lease at {self.path} was taken over mid-mutation "
                "(nonce changed) — this writer no longer holds it"
            )
        # (the expiry refusal already ran against the in-memory stamp,
        # which only ever lags the disk stamp — a hold that crossed its
        # TTL is takeover-eligible and a late re-stamp could overwrite
        # a contender's fresh lock with this stale nonce)
        held["acquired_ms"] = now_ms()
        held["ttl_ms"] = self.ttl_ms
        self._fs.write_text_atomic(self.path, json.dumps(held))
        # post-write verify: if a takeover still interleaved (clock
        # skew, pathological pause), fail loudly on this side rather
        # than both writers proceeding
        check = json.loads(self._fs.read_text(self.path))
        if check.get("nonce") != self.nonce:
            raise ConcurrentWriterError(
                f"lease at {self.path} was taken over during renew() "
                "— this writer no longer holds it"
            )
        self._stamped_at = time.monotonic()
        self._stamped_ttl_ms = int(self.ttl_ms)


@contextmanager
def writer_lease(
    fs: "HadoopFS", artifact_uri: str, ttl_ms: int = DEFAULT_LEASE_TTL_MS
):
    """Mutual exclusion for artifact mutations: an atomic
    claim-with-payload lock file — the store-CAS approximation that
    closes the meta fence's documented symmetric-interleave window on
    stores with an atomic namespace operation (hard link locally,
    no-overwrite rename on HDFS; see ``HadoopFS.create_exclusive``).

    The fence (:func:`fenced_meta_flip`) detects a competing commit at
    the flip; this lease PREVENTS two writers from being inside a
    mutation at all, so the fence's sub-second silent-loss interleave
    cannot start.  It also serializes ``vacuum_orphans`` against live
    mutations — without it, a vacuum racing an in-flight add could
    reclaim the add's staged dirs moments before their commit.

    Protocol: atomically materialize ``_writer_lock`` WITH its payload
    (nonce + acquire time + TTL) in one namespace op — there is no
    window where the lock exists empty, so a contender can never judge
    a live claim "corrupt therefore stale".  If it exists: a FRESH
    holder raises ``ConcurrentWriterError``; a STALE one (older than
    its TTL — a crashed writer, which cannot release) is taken over by
    RENAMING it aside to a contender-unique name — rename's
    source-must-exist semantics arbitrate concurrent takeovers to a
    single winner (no delete→create→delete→create interleave can mint
    two holders) — after which the winner verifies the displaced lock
    is the one it judged stale (a live claim that replaced it in
    between is restored and the takeover abandoned) and claims fresh.
    Release re-verifies the held nonce immediately before the delete.

    Re-entrant per THREAD (a writer already holding ``artifact_uri``
    nests without re-claiming); two threads still mutually exclude.
    Yields a :class:`LeaseHandle` — long mutations ``renew()`` it so a
    live hold never crosses its TTL.  On object stores without an
    atomic claim the lock degrades to advisory and the meta fence
    remains the guarantee (closable per-deployment via
    :func:`register_cas_store`).
    """
    key = artifact_uri.rstrip("/")
    held_map = getattr(_held_leases, "uris", None)
    if held_map is None:
        held_map = _held_leases.uris = {}
    if key in held_map:
        handle: LeaseHandle = held_map[key]["handle"]
        if int(ttl_ms) > handle.ttl_ms:
            # nested acquire asking for a LONGER lease (e.g. a
            # LONG-TTL consolidation inside a default
            # writer_session()): widen the held lease and write the
            # new TTL through, or the long fold becomes
            # takeover-eligible mid-mutation under the outer TTL —
            # exactly what LONG_LEASE_TTL_MS exists to prevent
            handle.ttl_ms = int(ttl_ms)
            with _timed_enforcement():
                handle.renew()
        held_map[key]["depth"] += 1
        try:
            yield handle
        finally:
            held_map[key]["depth"] -= 1
        return
    path = posixpath.join(artifact_uri, WRITER_LOCK_FILE)
    nonce = uuid.uuid4().hex
    payload = json.dumps(
        {"nonce": nonce, "acquired_ms": now_ms(), "ttl_ms": int(ttl_ms)}
    )
    with _timed_enforcement():
        _acquire_lease(fs, artifact_uri, path, nonce, payload, ttl_ms)
    handle = LeaseHandle(fs, path, nonce, ttl_ms)
    held_map[key] = {"handle": handle, "depth": 1}
    try:
        yield handle
    finally:
        del held_map[key]
        with _timed_enforcement():
            try:
                # re-verify the nonce immediately before the delete: a
                # takeover (only possible if this hold crossed its TTL
                # without renewing) must not have ITS fresh lock deleted
                # by the old holder's release
                held = json.loads(fs.read_text(path))
                if held.get("nonce") == nonce:
                    fs.delete(path, recursive=False)
            except Exception:
                pass  # lock already gone or taken over — nothing to release


def _acquire_lease(
    fs: "HadoopFS",
    artifact_uri: str,
    path: str,
    nonce: str,
    payload: str,
    ttl_ms: int,
) -> None:
    if not fs.create_exclusive(path, payload):
        try:
            raw = fs.read_text(path)
        except Exception:
            # the lock vanished between our failed claim and this read —
            # the holder RELEASED.  That is contention resolving, not
            # staleness: treating it as stale would displace whoever
            # claims next.  Raise; the caller may simply retry.
            raise ConcurrentWriterError(
                f"lost a lease claim race on {artifact_uri}: the prior "
                "holder released mid-arbitration — retry the mutation."
            )
        try:
            held = json.loads(raw)
        except Exception:
            held = {}  # present-but-corrupt lock (legacy crash artifact) = stale
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
        _take_over_stale_lock(fs, artifact_uri, path, held, nonce)
        if not fs.create_exclusive(path, payload):
            raise ConcurrentWriterError(
                f"lost the lease takeover race on {artifact_uri}: "
                "another writer re-claimed the expired lock first."
            )


def _take_over_stale_lock(
    fs: "HadoopFS",
    artifact_uri: str,
    path: str,
    observed: dict[str, Any],
    contender_nonce: str,
) -> None:
    """Displace a stale lock with a SINGLE winner: rename it aside to a
    contender-unique name (exactly one concurrent rename finds the
    source), then verify the displaced payload is the one this
    contender judged stale — if a live claim replaced it in between,
    restore it and abandon.  The old delete+create takeover lost this
    arbitration under a delete→create→delete→create interleave (the
    second delete removed the first winner's fresh lock)."""
    aside = f"{path}.stale.{contender_nonce}"
    if not fs.rename_if_exists(path, aside):
        raise ConcurrentWriterError(
            f"lost the lease takeover race on {artifact_uri}: "
            "another contender displaced the expired lock first."
        )
    try:
        displaced = json.loads(fs.read_text(aside))
    except Exception:
        displaced = {}
    if displaced.get("nonce") != observed.get("nonce"):
        # we displaced a LIVE lock that replaced the stale one between
        # our staleness read and our rename — put it back and yield.
        # If a THIRD contender claimed in that window the restore
        # fails; the displaced holder is stranded (its next renew or
        # release fails loudly on the foreign nonce) — delete the
        # aside on that path too, so no .stale.<nonce> file leaks.
        restored = False
        if not fs.exists(path):
            restored = fs.rename_if_exists(aside, path)
        if not restored:
            fs.delete(aside, recursive=False)
        raise ConcurrentWriterError(
            f"lost the lease takeover race on {artifact_uri}: the "
            "expired lock was already re-claimed by another writer."
            + (
                ""
                if restored
                else "  A live claim that displaced the expired lock "
                "could not be restored (a third contender claimed in "
                "between); that holder's next renew/release will fail "
                "loudly on the nonce check."
            )
        )
    fs.delete(aside, recursive=False)
    # housekeeping while we already won an arbitration on this lock:
    # crashed claimants can leak `<lock>.claim.<uuid>` temp files (a
    # crash between the temp write and the link/rename) and, before
    # this round, abandon paths could leak `.stale.<nonce>` asides —
    # sweep anything older than the lease TTL (safe: a live claim's
    # temp exists for milliseconds).  Floor at the DEFAULT TTL — a
    # lock carrying a custom tiny TTL must not make the sweeper judge
    # a seconds-old in-flight claim "leaked".
    fs.sweep_stale_lock_siblings(
        path,
        max(int(observed.get("ttl_ms", 0)), DEFAULT_LEASE_TTL_MS),
    )


def adopt_writer_session(artifact, lease: "LeaseHandle | None") -> None:
    """Route ``artifact``'s ``@locked_mutation`` methods through an
    externally-held lease instead of claiming per call.

    The lease's thread-local re-entrancy covers one writer THREAD, but
    a streaming ingest loop's ``foreachBatch`` callbacks may run on a
    different thread per micro-batch — all of them ONE logical writer
    holding one session across the stream.  An adopted lease makes
    that explicit: each mutation ``renew()``s the held lease (which
    raises if it expired or was taken over — a zombie driver's batch
    still fails loudly) and proceeds without a claim/release
    round-trip, cutting the measured ~0.2 s/batch enforcement cost to
    one renew read-modify-write.

    The caller owns acquisition and release (``writer_lease`` /
    ``Index.writer_session``); pass ``None`` to detach.  Single-writer
    responsibility is unchanged: adopting one lease into two artifacts
    or two concurrent streams is the same contract violation as two
    plain writers, and the fence remains the backstop."""
    artifact._adopted_lease = lease


def locked_mutation(fn=None, *, ttl_ms: int = DEFAULT_LEASE_TTL_MS):
    """Decorator serializing an artifact mutation method under
    :func:`writer_lease`.  The instance must expose ``spark`` and
    ``uri`` (the ``BM25Index`` / ``MinHashReference`` / ``Index``
    contract).  ``ttl_ms`` sizes the lease to the operation
    (consolidation-class rewrites pass :data:`LONG_LEASE_TTL_MS`); an
    instance attribute ``lease_ttl_ms`` overrides both.  An adopted
    lease (:func:`adopt_writer_session`) replaces the claim with a
    ``renew()`` of the externally-held lease."""

    def deco(f):
        @functools.wraps(f)
        def wrapper(self, *args: Any, **kwargs: Any):
            ttl = getattr(self, "lease_ttl_ms", None) or ttl_ms
            adopted: LeaseHandle | None = getattr(
                self, "_adopted_lease", None
            )
            if adopted is not None:
                if int(ttl) > adopted.ttl_ms:
                    adopted.ttl_ms = int(ttl)
                with _timed_enforcement():
                    adopted.renew()  # raises on expiry/takeover: a
                    # zombie stream's batch fails loudly, never writes
                key = self.uri.rstrip("/")
                held_map = getattr(_held_leases, "uris", None)
                if held_map is None:
                    held_map = _held_leases.uris = {}
                if key in held_map:
                    # this thread already nests under the same lease
                    return f(self, *args, **kwargs)
                # register for the call so nested writer_lease uses on
                # THIS thread (fresh handles opened inside folds) nest
                # instead of colliding with our own held lock
                held_map[key] = {"handle": adopted, "depth": 1}
                try:
                    return f(self, *args, **kwargs)
                finally:
                    del held_map[key]
            fs = HadoopFS(self.spark, self.uri)
            with writer_lease(fs, self.uri, ttl_ms=ttl):
                return f(self, *args, **kwargs)

        return wrapper

    return deco(fn) if fn is not None else deco


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


def _java_exc_is(exc: Exception, class_suffix: str) -> bool:
    """True when a py4j-raised exception wraps a Java exception whose
    class name (or any cause in its chain) ends with ``class_suffix``."""
    j = getattr(exc, "java_exception", None)
    seen = 0
    while j is not None and seen < 8:
        try:
            if str(j.getClass().getName()).endswith(class_suffix):
                return True
            j = j.getCause()
        except Exception:
            return False
        seen += 1
    return False


class CasStore:
    """Extension point for stores with a native compare-and-swap /
    conditional-create (e.g. S3 conditional PUT ``If-None-Match: *``,
    GCS ``ifGenerationMatch=0``, Azure ``If-None-Match: *``): implement
    ``create_exclusive`` as ONE conditional write and register it for
    the URI scheme — the writer lease then holds its full guarantee on
    that store with no library change.  In-tree, local (hard link) and
    HDFS (no-overwrite rename) are handled natively by
    ``HadoopFS.create_exclusive``; this seam exists for object stores
    whose Hadoop connector does not surface the conditional write."""

    def create_exclusive(self, fs: "HadoopFS", path: str, content: str) -> bool:
        raise NotImplementedError


_CAS_STORES: dict[str, CasStore] = {}


def register_cas_store(scheme: str, store: CasStore | None) -> None:
    """Register (or, with ``None``, remove) a :class:`CasStore` for a
    URI scheme; ``HadoopFS.create_exclusive`` consults it first."""
    if store is None:
        _CAS_STORES.pop(scheme, None)
    else:
        _CAS_STORES[scheme] = store


# process-wide LRU for small immutable per-snapshot driver artifacts
# (centroids, PQ codebooks, Vamana medoids).  Handles memoize per open,
# but streaming loops RE-OPEN the index every micro-batch (the snapshot
# discipline) and paid one Spark collect per artifact per batch; keyed
# on the ingestion entry's snapshot_nonce the cache is exact — unique
# per ingest, immutable for the snapshot's lifetime, and already in the
# meta the handle read (zero extra FS round-trips).  Legacy entries
# without a nonce skip the cache.  Bounded: a few hundred KB per entry
# (≤10k centroids × dims float64), 64 entries max.
_SNAPSHOT_ARTIFACTS: "dict[tuple, Any]" = {}
_SNAPSHOT_ARTIFACTS_LOCK = threading.Lock()
SNAPSHOT_ARTIFACT_CACHE_MAX = 64


class _FrozenDict(dict):
    """A dict whose mutators raise: cached snapshot artifacts are
    shared across handles, so in-place mutation must fail loudly.
    Unlike ``MappingProxyType`` it PICKLES (as a plain dict) — frozen
    medoid maps ride Spark broadcasts into executors, where the
    deserialized copy is private and mutation is harmless."""

    def _readonly(self, *args, **kwargs):
        raise TypeError(
            "cached snapshot artifact is read-only (shared across "
            "handles) — copy with dict(...) before mutating"
        )

    __setitem__ = __delitem__ = _readonly
    pop = popitem = clear = update = setdefault = _readonly

    def __reduce__(self):
        return (dict, (list(self.items()),))


def _freeze_artifact(val):
    """Make a cached artifact read-only before it is shared across
    handles: the cache returns the SAME object to every open of a
    snapshot, so an in-place mutation by one caller would silently
    poison all others.  ndarrays get ``writeable=False`` (mutation
    raises), dicts become :class:`_FrozenDict`, lists become tuples;
    scalars/strings are immutable already."""
    import numpy as np

    if isinstance(val, np.ndarray):
        val.setflags(write=False)
        return val
    if isinstance(val, dict):
        return _FrozenDict(
            {k: _freeze_artifact(v) for k, v in val.items()}
        )
    if isinstance(val, (list, tuple)):
        return tuple(_freeze_artifact(v) for v in val)
    return val


def cached_snapshot_artifact(key: tuple, loader):
    """Return the cached artifact for ``key`` (must embed the snapshot
    nonce), loading and inserting on miss.  Plain FIFO eviction — the
    workload is a handful of live snapshots, not a scan.  Values are
    frozen (:func:`_freeze_artifact`) before insertion: every handle
    shares one object, so it must be immutable."""
    with _SNAPSHOT_ARTIFACTS_LOCK:
        if key in _SNAPSHOT_ARTIFACTS:
            return _SNAPSHOT_ARTIFACTS[key]
    val = _freeze_artifact(loader())
    with _SNAPSHOT_ARTIFACTS_LOCK:
        _SNAPSHOT_ARTIFACTS[key] = val
        while len(_SNAPSHOT_ARTIFACTS) > SNAPSHOT_ARTIFACT_CACHE_MAX:
            _SNAPSHOT_ARTIFACTS.pop(next(iter(_SNAPSHOT_ARTIFACTS)))
    return val


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
        """Create ``path`` WITH ``content`` if absent, in ONE atomic
        namespace operation; False when it already exists.

        The payload travels with the claim — there is no window where
        the file exists empty (the old claim-then-write protocol let a
        contender read the empty lock, judge it corrupt-therefore-
        stale, and displace a LIVE claimant).  Mechanism per store:

        - a deployment-registered CAS store for this scheme
          (:func:`register_cas_store` — e.g. S3 conditional PUT
          ``If-None-Match: *``) takes priority;
        - local paths: write a temp file, then ``java.nio
          Files.createLink`` (hard link: atomic, fails if the target
          exists — the classic POSIX lockfile primitive; Hadoop's
          RawLocalFileSystem check-then-create is NOT atomic);
        - other schemes: write a temp file, then ``FileContext.rename``
          WITHOUT overwrite — a single namespace op on HDFS that fails
          if the destination exists;
        - last resort (FS supports neither): ``FileSystem.create
          (overwrite=false)`` then write — the legacy two-step, kept
          only as the advisory-degradation fallback.
        """
        store = _CAS_STORES.get(self._fs.getUri().getScheme() or "file")
        if store is not None:
            return store.create_exclusive(self, path, content)
        p = self._p(path)
        tmp = f"{path}.claim.{uuid.uuid4().hex}"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(content.encode("utf-8")))
        finally:
            out.close()
        scheme = self._fs.getUri().getScheme()
        if scheme in (None, "file"):
            jnio = self._jvm.java.nio.file
            jfile = self._jvm.java.io.File
            try:
                jnio.Files.createLink(
                    jfile(p.toUri().getPath()).toPath(),
                    jfile(self._p(tmp).toUri().getPath()).toPath(),
                )
                return True
            except Exception as exc:
                if _java_exc_is(exc, "FileAlreadyExistsException"):
                    return False
                # hard links unsupported on this mount — legacy fallback
                return self._create_exclusive_fallback(p, content)
            finally:
                self._fs.delete(self._p(tmp), False)
        try:
            jvm = self._jvm
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._fs.getUri(), self._conf
            )
            opts = self._gateway.new_array(
                jvm.org.apache.hadoop.fs.Options.Rename, 1
            )
            opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.NONE
            fc.rename(self._p(tmp), p, opts)
            return True
        except Exception as exc:
            self._fs.delete(self._p(tmp), False)
            if _java_exc_is(exc, "FileAlreadyExistsException"):
                return False
            return self._create_exclusive_fallback(p, content)

    def _create_exclusive_fallback(self, p, content: str) -> bool:
        """Legacy two-step claim (create-no-overwrite, then write the
        payload): NOT atomic claim-with-payload — a crash between the
        two leaves an empty lock that readers treat as stale.  Reached
        only on stores with neither hard links nor a no-overwrite
        rename; there the lease is advisory and the meta fence is the
        remaining guarantee."""
        try:
            out = self._fs.create(p, False)
            out.close()
        except Exception:
            return False
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

    def rename_if_exists(self, src: str, dst: str) -> bool:
        """Plain namespace rename: False when ``src`` is already gone
        (the arbitration primitive for stale-lock takeover — exactly
        one concurrent rename finds the source).  Never deletes an
        existing ``dst``; callers pass unique destinations."""
        try:
            return bool(self._fs.rename(self._p(src), self._p(dst)))
        except Exception:
            return False

    def sweep_stale_lock_siblings(self, lock_path: str, ttl_ms: int) -> int:
        """Delete leaked lock-protocol temp files next to ``lock_path``:
        ``<lock>.claim.<uuid>`` (a claimant crashed between its temp
        write and the atomic link/rename) and ``<lock>.stale.<nonce>``
        (a takeover abandon path interrupted before cleanup).  Only
        files older than ``ttl_ms`` are touched — a live claim's temp
        exists for milliseconds, so age == leak.  Returns the count.
        Called from lease takeover and from ``IndexStorage.vacuum``;
        never on the hot path."""
        parent = posixpath.dirname(lock_path)
        base = posixpath.basename(lock_path)
        if not self.exists(parent):
            return 0
        cutoff_ms = now_ms() - int(ttl_ms)
        swept = 0
        for st in self._fs.listStatus(self._p(parent)):
            name = st.getPath().getName()
            if not (
                name.startswith(base + ".claim.")
                or name.startswith(base + ".stale.")
            ):
                continue
            if int(st.getModificationTime()) >= cutoff_ms:
                continue
            if self.delete(posixpath.join(parent, name), recursive=False):
                swept += 1
        return swept

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

    def commit_meta(self, meta: dict[str, Any]) -> dict[str, Any]:
        """Commit a MUTATED meta through the writer fence
        (:func:`fenced_meta_flip`): ``meta`` must be the dict as read
        by this mutation (it carries the ``meta_version`` the writer
        observed), so a competing commit in the read-modify-write
        window raises ``ConcurrentWriterError`` on the losing side
        instead of silently dropping the winner's entry.  The index's
        committed-batch read filter (``read_updates_raw``) makes an
        unfenced loss WORSE than pre-filter behavior — a dropped
        ``update_batches`` entry turns that batch's parquet rows
        permanently invisible — so every meta mutation commits through
        here.  Legacy metas without ``meta_version`` fence from 0."""
        expected = int(meta.get("meta_version", 0))
        return fenced_meta_flip(self.fs, self.meta_path, meta, expected)

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
        # snapshot_nonce: a unique immutable identity for this ingestion
        # — the cache key for per-snapshot driver artifacts (centroids,
        # codebooks, medoids).  base_ts alone is NOT an identity:
        # delete_index + re-ingest at the same timestamp is a different
        # snapshot with the same (uri, ts).
        entry = {
            "ts": ts,
            "base_size": base_size,
            "snapshot_nonce": uuid.uuid4().hex,
            **(extra_meta or {}),
        }
        meta["ingestions"].append(entry)
        meta["ingestions"].sort(key=lambda e: e["ts"])
        self.commit_meta(meta)

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
        self._commit_update_batch(ts)

    def append_updates_rows(
        self, rows: list[tuple], ts: int
    ) -> None:
        """Driver-resident DML batch (single update/delete calls, small
        list batches) appended WITHOUT a Spark job: the rows already sit
        on the driver, so the parquet append is a pyarrow write on local
        storage (Spark fallback on remote URIs).  Same pinned log schema
        and the same fenced meta-flip commit point as
        :meth:`append_updates`.

        ``rows``: (external_id, vector|None, is_delete, ts) tuples.
        """
        from tiledb_vector_search_spark.driver_io import append_small_parquet

        append_small_parquet(
            self.spark,
            self.updates_path,
            rows,
            f"{ID_COL} long, {VECTOR_COL} array<float>, "
            "is_delete boolean, ts long",
        )
        self._commit_update_batch(ts)

    def _commit_update_batch(self, ts: int) -> None:
        # the meta flip is the COMMIT POINT (readers filter to the
        # committed list) and this is a read-modify-write — fence it:
        # a concurrent writer's flip in the window would silently drop
        # this batch's ts and its rows would stay invisible forever
        meta = self.read_meta()
        meta["update_batches"].append(ts)
        self.commit_meta(meta)

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
        raw = self.spark.read.parquet(self.updates_path)
        ts_list = [int(t) for t in batches]
        if len(ts_list) <= 256:
            return raw.where(F.col("ts").isin(ts_list))
        # a long-running streaming ingest commits thousands of batches
        # between consolidations; an IN-list that size bloats the plan
        # (analysis + codegen cost grows with the literal count), so
        # filter via a broadcast semi-join on a tiny batches frame —
        # same semantics, O(1) plan size
        from tiledb_vector_search_spark.session import small_df

        committed = small_df(
            self.spark, [(t,) for t in ts_list], "ts long"
        )
        return raw.join(F.broadcast(committed), "ts", "left_semi")

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
        self.commit_meta(meta)

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
        # authoritative reclamation floor: every batch ≤ this ts is gone
        # (or never existed).  Readers that REPLAY log history — the
        # index_changes CDC source — compare their window against it to
        # fail loudly instead of silently emitting a partial replay.
        meta["updates_cleared_through"] = max(
            int(ts), int(meta.get("updates_cleared_through", 0))
        )
        self.commit_meta(meta)

    # -- history management --------------------------------------------------

    def vacuum(self, keep_latest: int = 1) -> list[int]:
        """Drop all but the newest ``keep_latest`` base snapshots.

        Reference: fragment consolidation + vacuum (``index.py:579-598``,
        ``ingestion.py:3014-3063``).
        """
        # housekeeping: reclaim leaked lock-protocol temp files (crashed
        # claimants' `.claim.<uuid>`, interrupted takeovers' `.stale.*`)
        # alongside the snapshots — vacuum is the operator's "reclaim
        # space" verb and these files have no other collector
        self.fs.sweep_stale_lock_siblings(
            posixpath.join(self.uri, WRITER_LOCK_FILE), DEFAULT_LEASE_TTL_MS
        )
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
        self.commit_meta(meta)
        # update batches at or before the oldest RETAINED base are now
        # unreachable (every remaining readable timestamp resolves to a
        # base >= it, and windows are exclusive of the base ts) — this
        # is where folded history gets destroyed, NOT at consolidation
        # (r11 parity: reference consolidate keeps history; vacuum
        # reclaims it, index.py:579-735)
        oldest_kept = int(meta["ingestions"][0]["ts"])
        if any(int(t) <= oldest_kept for t in meta["update_batches"]):
            self.clear_updates_through(oldest_kept)
        return [e["ts"] for e in drop]

    def delete_index(self) -> None:
        self.fs.delete(self.uri)
