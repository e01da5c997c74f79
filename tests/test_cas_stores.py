"""S3 conditional-PUT CasStore (r11): the in-tree implementation of the
``register_cas_store`` seam, so a deployment closes the object-store
advisory-lease window by installing boto3 and calling one function —
not by writing code.  No object store exists in this sandbox, so the
store is driven against a stub client that enforces the real S3
conditional-write contract (If-None-Match: * → 412 on existing keys,
409 on racing conditional PUTs)."""

from __future__ import annotations

import json
import threading

import pytest

from tiledb_vector_search_spark.cas_stores import (
    S3ConditionalPutCasStore,
    _split_bucket_key,
    register_s3_cas,
)
from tiledb_vector_search_spark.storage import register_cas_store


class _StubClientError(Exception):
    def __init__(self, code=None, status=None):
        self.response = {"Error": {}, "ResponseMetadata": {}}
        if code:
            self.response["Error"]["Code"] = code
        if status:
            self.response["ResponseMetadata"]["HTTPStatusCode"] = status


class _StubS3:
    """In-memory S3 with the conditional-write contract.  A lock makes
    each conditional PUT atomic, mirroring S3's server-side
    arbitration of concurrent conditional writes."""

    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.calls: list[dict] = []
        self._lock = threading.Lock()
        self.raise_conflict_once = False

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        self.calls.append(
            {"Bucket": Bucket, "Key": Key, "IfNoneMatch": IfNoneMatch}
        )
        assert IfNoneMatch == "*", "store must send the conditional header"
        with self._lock:
            if self.raise_conflict_once:
                self.raise_conflict_once = False
                raise _StubClientError(code="ConflictingOperation", status=409)
            if (Bucket, Key) in self.objects:
                raise _StubClientError(code="PreconditionFailed", status=412)
            self.objects[(Bucket, Key)] = Body


def test_split_bucket_key():
    assert _split_bucket_key("s3a://bkt/a/b/_writer_lock") == (
        "bkt",
        "a/b/_writer_lock",
    )
    with pytest.raises(ValueError):
        _split_bucket_key("/local/path/_writer_lock")
    with pytest.raises(ValueError):
        _split_bucket_key("s3a://bucketonly")


def test_conditional_put_claims_once():
    s3 = _StubS3()
    store = S3ConditionalPutCasStore(client=s3)
    path = "s3a://bkt/idx/_writer_lock"
    payload = json.dumps({"nonce": "n1", "acquired_ms": 1, "ttl_ms": 5})
    assert store.create_exclusive(None, path, payload) is True
    assert s3.objects[("bkt", "idx/_writer_lock")] == payload.encode()
    # second claim loses: 412 maps to False, never an exception
    assert store.create_exclusive(None, path, "other") is False
    assert s3.objects[("bkt", "idx/_writer_lock")] == payload.encode()


def test_conflicting_operation_maps_to_lost_claim():
    """A racing conditional PUT surfaces as 409 ConflictingOperation —
    the claimant did NOT win; retrying could steal a freshly-created
    lock, so the store maps it to False (claim failed)."""
    s3 = _StubS3()
    s3.raise_conflict_once = True
    store = S3ConditionalPutCasStore(client=s3)
    assert store.create_exclusive(None, "s3a://b/k/lock", "x") is False
    # next attempt (no conflict, key absent) wins normally
    assert store.create_exclusive(None, "s3a://b/k/lock", "x") is True


def test_unrelated_errors_propagate():
    class _Denied:
        def put_object(self, **kw):
            raise _StubClientError(code="AccessDenied", status=403)

    store = S3ConditionalPutCasStore(client=_Denied())
    with pytest.raises(_StubClientError):
        store.create_exclusive(None, "s3a://b/k/lock", "x")


def test_concurrent_claims_single_winner():
    """8 threads race one lock through the store: exactly one True."""
    s3 = _StubS3()
    store = S3ConditionalPutCasStore(client=s3)
    results = []
    barrier = threading.Barrier(8)

    def claim(i):
        barrier.wait()
        results.append(
            store.create_exclusive(None, "s3a://b/idx/_writer_lock", f"n{i}")
        )

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count(True) == 1
    assert results.count(False) == 7


def test_register_s3_cas_wires_the_seam():
    s3 = _StubS3()
    store = register_s3_cas("s3a", client=s3)
    try:
        from tiledb_vector_search_spark.storage import _CAS_STORES

        assert _CAS_STORES["s3a"] is store
    finally:
        register_cas_store("s3a", None)


def test_real_boto3_construction():
    """boto3 is present in this environment: the no-client path must
    construct a real client (no network call happens on construction)."""
    pytest.importorskip("boto3")
    store = S3ConditionalPutCasStore(region_name="us-east-1")
    assert hasattr(store._client, "put_object")
