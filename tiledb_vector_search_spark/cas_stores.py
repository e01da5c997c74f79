"""Object-store CAS implementations for the writer lease.

The lease's single-winner guarantee needs ONE atomic create-if-absent
namespace operation (``HadoopFS.create_exclusive``).  Local filesystems
and HDFS have native primitives (hard link, no-overwrite rename); plain
object-store PUTs do not, so the lease degrades to advisory there and
the meta fence is the remaining guarantee (``storage.py`` module docs).

This module closes that advisory window for S3-compatible stores using
the S3 **conditional write** — ``PutObject`` with ``If-None-Match: *``
fails with ``412 Precondition Failed`` when the key already exists, and
S3 arbitrates concurrent conditional PUTs to a single winner (losers
see 412 or a 409 ``ConflictingOperation``).  One conditional write IS
the atomic claim-with-payload the lease protocol wants.  GCS
(``ifGenerationMatch=0``) and Azure (``If-None-Match: *``) have the
same primitive; implement :class:`~tiledb_vector_search_spark.storage.
CasStore` analogously and register it for their schemes.

Reference context: the reference sidesteps writer races because TileDB
fragments are append-immutable on object storage; a pointer-flip layout
needs this explicit CAS (SURVEY §2.8 concurrency notes).

Deployment::

    from tiledb_vector_search_spark.cas_stores import register_s3_cas

    register_s3_cas("s3a")            # boto3 default credential chain
    # ... writer leases on s3a:// indexes now hold their full guarantee

boto3 is an optional dependency: importing this module is safe without
it; constructing the store without a ``client`` raises ``ImportError``
with instructions.
"""

from __future__ import annotations

from typing import Any

from tiledb_vector_search_spark.storage import CasStore, register_cas_store

# outcomes of a lost conditional write, per the S3 API: 412 is the
# documented exists-already failure; 409 ConflictingOperation is the
# in-flight concurrent-conditional-write race, which also means this
# claimant did not win (retrying could steal a freshly-created lock,
# so it maps to "claim failed", never to retry)
_LOST_CODES = {"PreconditionFailed", "ConflictingOperation", "412", "409"}


def _split_bucket_key(path: str) -> tuple[str, str]:
    """``s3a://bucket/a/b`` → ``("bucket", "a/b")``."""
    scheme_rest = path.split("://", 1)
    if len(scheme_rest) != 2 or "/" not in scheme_rest[1]:
        raise ValueError(
            f"not a bucket-qualified object-store path: {path!r} "
            "(expected scheme://bucket/key)"
        )
    bucket, key = scheme_rest[1].split("/", 1)
    if not bucket or not key:
        raise ValueError(f"empty bucket or key in {path!r}")
    return bucket, key


def _error_code(exc: Exception) -> str | None:
    """The S3 error code (or HTTP status) out of a botocore
    ``ClientError`` — read structurally so this works against stub
    clients in tests and real botocore alike."""
    resp = getattr(exc, "response", None)
    if not isinstance(resp, dict):
        return None
    err = resp.get("Error") or {}
    code = err.get("Code")
    if code:
        return str(code)
    meta = resp.get("ResponseMetadata") or {}
    status = meta.get("HTTPStatusCode")
    return str(status) if status is not None else None


class S3ConditionalPutCasStore(CasStore):
    """Atomic create-if-absent via S3 conditional PUT
    (``If-None-Match: *``).

    One request, one winner: the claim and its payload land together,
    so there is no empty-lock window and no read-back arbitration —
    exactly the semantics ``HadoopFS.create_exclusive`` provides
    natively on local/HDFS stores.
    """

    def __init__(self, client: Any = None, **boto3_client_kwargs: Any):
        """``client``: a boto3 S3 client (or any object with the same
        ``put_object`` contract — e.g. a moto/stub client in tests).
        Without one, a real client is built from the default boto3
        credential chain with ``boto3_client_kwargs`` passed through
        (``endpoint_url=`` for S3-compatible stores, ``region_name=``,
        ...)."""
        if client is None:
            try:
                import boto3
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "S3ConditionalPutCasStore needs boto3 (pip install "
                    "boto3), or pass an s3-compatible client explicitly"
                ) from exc
            client = boto3.client("s3", **boto3_client_kwargs)
        self._client = client

    def create_exclusive(self, fs, path: str, content: str) -> bool:
        bucket, key = _split_bucket_key(path)
        try:
            self._client.put_object(
                Bucket=bucket,
                Key=key,
                Body=content.encode("utf-8"),
                IfNoneMatch="*",
            )
            return True
        except Exception as exc:
            if _error_code(exc) in _LOST_CODES:
                return False
            raise


def register_s3_cas(
    scheme: str = "s3a", client: Any = None, **boto3_client_kwargs: Any
) -> S3ConditionalPutCasStore:
    """Build an :class:`S3ConditionalPutCasStore` and register it for
    ``scheme`` — after this, writer leases on ``scheme://`` indexes
    hold their full single-winner guarantee.  Returns the store (pass
    ``register_cas_store(scheme, None)`` to remove it)."""
    store = S3ConditionalPutCasStore(client=client, **boto3_client_kwargs)
    register_cas_store(scheme, store)
    return store
