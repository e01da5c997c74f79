"""Perceptual video near-duplicate detection.

Completes the multimodal dedup family (text: ``operators/dedup.py``,
image: ``operators/image_dedup.py``, audio: ``operators/audio_dedup.py``):
re-encoded / re-containered copies of the same clip dominate crawled
video, and byte hashing misses every one of them.  The classic remedy
is per-frame perceptual hashing plus a temporal vote — two videos are
near-duplicates when ENOUGH of their frames match pairwise within a
small hamming radius AND roughly in sequence.

Reference status: the reference has no video dedup (its object
pipeline embeds media for ANN); this is part of the LLM-training-data
operator set the engine adds.

Spark shape (100 TB):

1. ``video_frame_phashes`` — ONE ``mapInPandas`` pass over the binary
   column: the container is magic-dispatched (MJPEG / concatenated-PNM
   / animated GIF / animated WebP — the native frame samplers in
   ``objects/``), every ``every_n``-th frame is decoded and pHashed
   (the shared 64-bit DCT hash of ``image_dedup``), emitting
   (id, frame_idx, phash) — 16 bytes per sampled frame; the video
   bytes themselves NEVER shuffle.  ``max_frames`` caps the per-blob
   output so a pathological hour-long stream cannot skew a task.
2. Frame-level candidates via the same pigeonhole band-join as
   simhash/pHash/audio: a frame pair within radius r must agree
   exactly on one of r+1 hash chunks, so the equi-join shuffle is
   keyed on (chunk, chunk-value) and all-pairs work is confined to
   band buckets.  The temporal constraint (|frame_a − frame_b| ≤
   ``temporal_drift``) and the radius verify are inlined into the join
   condition, so misaligned or far frames die inside the join.
3. One aggregation keyed on the video pair counts DISTINCT matched
   frames of the smaller-id side; pairs with ≥ ``min_frame_matches``
   survive.  Output rows are bounded by genuinely-similar pairs, not
   by the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.operators.image_dedup import (
    PHASH_BITS,
    phash64_pixels,
)

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def sample_video_frames(blob: bytes, every_n: int = 1) -> list:
    """Magic-dispatched frame sampling over an opaque video blob:
    MJPEG (concatenated JFIF), concatenated binary PNM (the ffmpeg
    ``image2pipe -vcodec pnm`` layout), animated GIF, animated WebP.
    Unknown containers raise ValueError (callers treat the blob as
    undecodable, the same per-blob isolation contract as
    ``image_dedup.phash64``)."""
    b = bytes(blob)
    if b[:2] == b"\xff\xd8":
        from tiledb_vector_search_spark.objects.codecs import (
            sample_mjpeg_frames,
        )

        return sample_mjpeg_frames(b, every_n)
    if b[:2] in (b"P5", b"P6"):
        from tiledb_vector_search_spark.objects.codecs import (
            sample_pnm_frames,
        )

        return sample_pnm_frames(b, every_n)
    if b[:6] in _GIF_MAGICS:
        from tiledb_vector_search_spark.objects.gif import sample_gif_frames

        return sample_gif_frames(b, every_n)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from tiledb_vector_search_spark.objects.webp import (
            sample_webp_frames,
        )

        return sample_webp_frames(b, every_n)
    raise ValueError("unrecognized video container")


def video_frame_phashes(
    df: DataFrame,
    blob_col: str = "video",
    id_col: str = "external_id",
    every_n: int = 1,
    max_frames: int = 64,
) -> DataFrame:
    """(id, frame_idx, phash): one Arrow pass splitting video blobs
    into frames and pHashing each sampled frame.  ``frame_idx`` is the
    SAMPLED index (0, 1, 2, …), so the temporal-drift join below is in
    units of sampled frames.  Undecodable blobs yield a single row
    with NULL phash (kept for decode-failure audits; the join drops
    them)."""

    schema = f"{id_col} long, frame_idx int, phash long"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidx, hashes = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if pd.isna(i):
                    continue  # NULL id: int() would kill the task
                try:
                    frames = sample_video_frames(bytes(blob), every_n)
                except Exception:
                    frames = None
                if not frames:
                    ids.append(int(i))
                    fidx.append(0)
                    hashes.append(None)
                    continue
                for k, frame in enumerate(frames[:max_frames]):
                    ids.append(int(i))
                    fidx.append(k)
                    try:
                        hashes.append(phash64_pixels(frame))
                    except Exception:
                        hashes.append(None)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "phash": hashes}
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def video_near_duplicates(
    df: DataFrame,
    blob_col: str = "video",
    id_col: str = "external_id",
    max_hamming: int = 8,
    min_frame_matches: int = 3,
    temporal_drift: int = 2,
    every_n: int = 1,
    max_frames: int = 64,
) -> DataFrame:
    """(id_a, id_b, matched_frames) with id_a < id_b: video pairs where
    ≥ ``min_frame_matches`` distinct frames of ``id_a`` match a frame
    of ``id_b`` within ``max_hamming`` bits and ``temporal_drift``
    sampled-frame positions."""
    fp = video_frame_phashes(
        df, blob_col, id_col, every_n=every_n, max_frames=max_frames
    ).where(F.col("phash").isNotNull())
    pairs = video_fingerprint_near_duplicates(
        fp,
        id_col=id_col,
        max_hamming=max_hamming,
        min_frame_matches=min_frame_matches,
        temporal_drift=temporal_drift,
    )
    return pairs


def video_fingerprint_near_duplicates(
    fp: DataFrame,
    id_col: str = "external_id",
    frame_col: str = "frame_idx",
    hash_col: str = "phash",
    max_hamming: int = 8,
    min_frame_matches: int = 3,
    temporal_drift: int = 2,
) -> DataFrame:
    """The pure-Catalyst back half over an (id, frame_idx, phash)
    fingerprint table — split out so a frozen fingerprint artifact can
    be queried (and oracle-checked) without re-decoding video.

    Same combination-pigeonhole soundness as
    ``hamming.hamming_near_pairs`` (see that module's docstring): a
    frame pair within ``max_hamming`` differs in ≤ ``max_hamming``
    bits, so ≥ 2 of the ``max_hamming + 2`` hash blocks agree exactly
    and the pair shares a block-PAIR band key.  The TEMPORAL window is
    banded too, not just verified: frames bucket by
    ``f // (temporal_drift + 1)`` and each row is emitted under its own
    bucket AND the next one, so frames within the drift window (whose
    buckets differ by ≤ 1) always share a bucket key while distant
    frames of popular hashes never meet — the band key space scales
    with clip length, which is what keeps long-video corpora from
    going quadratic.  The exact ``|Δf|`` check and ``bit_count(xor)``
    verify are inlined in the join condition; multi-band duplicates
    collapse in the distinct; the final aggregate is keyed on the
    video pair."""
    from tiledb_vector_search_spark.operators.hamming import (
        combination_band_sql,
    )

    fw = temporal_drift + 1
    # ONE F.expr round-trip for the ~90 band-struct trees: built
    # Column-by-Column these are ~1000 py4j calls (~5 s of driver time
    # per invocation); the SQL string parses JVM-side to the identical
    # Catalyst tree (hamming.combination_band_sql doc)
    fbucket = f"CAST(FLOOR(`{frame_col}` / {fw}) AS BIGINT)"
    structs = ", ".join(
        f"struct({band} AS band, {key} AS key, ({fbucket} + {off}) AS fb)"
        for band, key in combination_band_sql(
            hash_col, PHASH_BITS, max_hamming
        )
        for off in (0, 1)
    )
    banded = fp.select(
        F.col(id_col).alias("vid"),
        F.col(frame_col).alias("f"),
        F.col(hash_col).alias("h"),
        F.expr(f"explode(array({structs}))").alias("cc"),
    ).select(
        "vid", "f", "h",
        F.col("cc.band"), F.col("cc.key"), F.col("cc.fb"),
    )
    # the exploded banded frame is ~90x the fingerprint table, but
    # Catalyst's size estimate doesn't account for the explode — left
    # alone it BROADCASTS the build side (2 GB+ at modest corpus
    # sizes).  The hint forces a partitioned hash join on the band
    # keys: build side is one partition's bucket slice, never the
    # whole table, at any scale.
    a = banded.alias("a")
    b = banded.hint("shuffle_hash").alias("b")
    matches = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.fb") == F.col("b.fb"),
                F.col("a.vid") < F.col("b.vid"),
                F.abs(F.col("a.f") - F.col("b.f")) <= temporal_drift,
                F.bit_count(
                    F.col("a.h").bitwiseXOR(F.col("b.h"))
                ) <= max_hamming,
            ],
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.f").alias("f_a"),
            F.col("b.f").alias("f_b"),
        )
        .distinct()  # collapse multi-band duplicates of the same match
    )
    return (
        matches.groupBy("id_a", "id_b")
        .agg(F.countDistinct("f_a").alias("matched_frames"))
        .where(F.col("matched_frames") >= min_frame_matches)
    )
