"""BM25 ranked retrieval: inverted-index postings join, pure Catalyst.

The classic lexical top-k (Robertson/Spärck Jones; the Lucene "BM25+1"
idf form) as a Spark-first dataflow — the text-side complement of the
embedding kNN operators, and the retrieval primitive LLM data pipelines
use for hard-negative mining, near-duplicate triage, and benchmark
decontamination at corpus scale.

Reference parity: the reference engine has no lexical retrieval; this is
part of the LLM-training-data operator set the engine adds on top (the
``operators/dedup.py`` / ``functions/text.py`` family).

Shuffle architecture for 100 TB:
  1. postings — one word-count-shaped shuffle keyed on (doc, term) for
     tf, one keyed on term for df; both map-side combined.
  2. corpus stats (N, avgdl) — a two-value aggregate broadcast via the
     cross-join-tiny pattern; never a driver round-trip in the plan.
  3. query match — query terms are a SMALL exploded frame broadcast onto
     the postings (hash join on term): the corpus never shuffles for a
     query batch.
  4. score — one (query, doc) aggregation bounded by matched postings,
     then the shared bounded top-k window.

Determinism contract (oracle-exact across engines): per-term partial
scores are quantized to DECIMAL(18,9) BEFORE the distributed sum — exact
and associative, so fold order cannot change the total (the
``unigram_logprob_score`` pattern) — and ranking uses the ROUNDED total,
so both engines break ties identically on (score desc, doc_id).
"""

from __future__ import annotations

import json
import posixpath
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tiledb_vector_search_spark.functions.text import tokens
from tiledb_vector_search_spark.storage import locked_mutation
from tiledb_vector_search_spark.operators.topk import topk_window

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75

BM25_META_FILE = "_bm25_meta.json"
BM25_POSTINGS_DIR = "postings"
BM25_DFREQ_DIR = "term_stats"
# incremental batches stage OUTSIDE the flat base dirs (a subdir inside
# them would leak into readers via parquet partition discovery before
# the commit point); readers see a batch only once meta lists it
BM25_POSTINGS_BATCHES_DIR = "postings_batches"
BM25_DFREQ_BATCHES_DIR = "term_stats_batches"
# delete batches: doc-id tombstones + NEGATIVE df deltas (same staged
# batch=<id> + meta-flip commit discipline as add_documents)
BM25_TOMBSTONES_DIR = "tombstones"


def _tf_saturation(tf: Column, dl: Column, avgdl: Column, k1: float, b: float) -> Column:
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _partial_nanos(
    post: DataFrame, k1: float, b: float, id_col: str
) -> DataFrame:
    """(id_col, __t, __p): the per-(term, doc) partial idf·tf_sat as
    exact integer NANO-UNITS — decimal(18,9) × 10⁹ → long is exact, long
    addition is order-independent AND a codegen primitive (the
    decimal-object sum was the dominant cost of a corpus-sized
    (query, doc) aggregation; the long fold restores linear scaling) —
    the same integer-micro-unit contract the SQL TVF uses."""
    avgdl = F.col("__sumdl").cast("double") / F.col("__n").cast("double")
    idf = F.log(
        1.0 + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    part = F.round(
        idf * _tf_saturation(
            F.col("__tf").cast("double"), F.col("__dl").cast("double"),
            avgdl, k1, b,
        ),
        9,
    ).cast("decimal(18,9)")
    nano = (part * F.lit(1_000_000_000)).cast("long")
    return post.select(F.col(id_col), "__t", nano.alias("__p"))


def _score_matched_postings(
    post: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared scoring tail: ``post`` is the query-restricted postings frame
    carrying (id_col, __t, __tf, __dl, __df, __n, __sumdl); the per-(term,
    doc) partial is computed ONCE and only the quantized nano-unit long
    rides the (query, term, doc) expansion.  Identical math in the
    one-shot and artifact paths — parity is by construction.  score =
    Σnano/10⁹ is exact in double (≪ 2⁵³), so round(·, 6) matches the
    original decimal fold bit-for-bit."""
    part_df = _partial_nanos(post, k1, b, id_col)
    scored = (
        part_df.join(qterms, "__t")
        .groupBy(query_id_col, id_col)
        .agg(
            F.round(
                (F.sum("__p") / F.lit(1_000_000_000.0)).cast("double"), 6
            ).alias("score")
        )
    )
    order = [F.col("score").desc(), F.col(id_col).asc()]
    return topk_window(scored, [query_id_col], order, k)


def _explode_query_terms(
    queries: DataFrame, query_id_col: str, query_text_col: str
) -> DataFrame:
    return queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(tokens(query_text_col))).alias("__t"),
    ).where(F.col("__t") != "")


# query batches up to this size may score through the doc-partitioned
# int64 kernel (the knn KERNEL_MAX_NQ discipline: the query-term
# indicator matrix is broadcast, so its size must stay bounded)
BM25_KERNEL_MAX_NQ = 4096
# ... and the batch VOCABULARY must stay bounded too: the broadcast
# indicator matrix is nq × |distinct terms| int64 and every task holds
# two |terms| × _KERNEL_DOC_CHUNK dense int64 planes, so a
# decontamination-style batch of document-length queries (10⁵–10⁶
# distinct terms) would OOM the driver collect, the broadcast, AND the
# tasks if `auto` picked the kernel.  At the cap: indicator ≤
# 4096 × 65536 × 8 B = 2 GiB worst case but real batches hit ONE of the
# two caps, and the per-task planes are ≤ 65536 × 8192 × 8 × 2 = 8 GiB
# only when the vocab cap binds — so the doc chunk shrinks adaptively
# (see _score_matched_postings_kernel) to keep tasks ≤ ~256 MB.
BM25_KERNEL_MAX_TERMS = 65536
# the `auto` path probes BOTH caps with ONE bounded limit-collect of the
# exploded (query, term) pairs — the same collect the kernel needs
# anyway, so choosing the kernel costs zero extra jobs.  The pair cap
# bounds the driver transfer (~1M rows ≈ 100 MB of Python tuples); a
# batch past it falls back to the join plan before the caps are even
# checked.  Legit kernel batches sit far below it (100 ranked queries ≈
# 10⁴ pairs; a 4096-query decontamination batch of ~200-term chunks ≈
# 8×10⁵).
BM25_KERNEL_MAX_PAIRS = 1_000_000
# docs-axis chunk for the dense (terms × docs) partial matrix: bounds
# per-task memory at |batch vocab| × 8192 × 8 B regardless of how many
# matched docs land in one partition
_KERNEL_DOC_CHUNK = 8192


def _score_matched_postings_kernel(
    part_df: DataFrame,
    qterm_rows: list,
    k: int,
    id_col: str,
    query_id_col: str,
    query_id_type: str = "long",
    doc_id_type: str = "long",
) -> DataFrame:
    """Kernel twin of :func:`_score_matched_postings`'s scoring tail —
    BIT-IDENTICAL output, different physical plan.

    The join plan expands ``Σ_t |postings_t|·|queries∋t|`` rows through a
    (query, term, doc) shuffle before the (query, doc) aggregate; on
    corpora where query terms are dense (or batches large) that
    expansion dominates (measured 1.5× per-decade super-linear wall-time
    drift at the 10× scaling point).  Here the matched partials
    repartition ONCE by doc (narrow rows, no query dimension), each
    partition computes every query's exact score for ITS docs as an
    int64 indicator-matmul (nano-unit partials: exact, fold-order-free),
    keeps a per-partition top-k, and the global merge ranks
    ``nparts × nq × k`` rows — the brute-force-kNN kernel shape applied
    to lexical scoring.

    ``qterm_rows``: collected (query_id, term) pairs — bounded by
    ``BM25_KERNEL_MAX_NQ`` queries AND ``BM25_KERNEL_MAX_TERMS`` distinct
    terms (the indicator matrix is broadcast; both axes are probed
    BEFORE the collect).

    ``query_id_type``: Spark type name of the caller's query-id column —
    the Arrow schema here is fixed at ``long``, so the result is cast
    back so kernel and join strategies return an IDENTICAL schema
    whatever ``auto`` picked.
    """
    import numpy as np
    import pandas as pd

    spark = part_df.sparkSession
    terms = sorted({t for _, t in qterm_rows})
    t_idx = {t: i for i, t in enumerate(terms)}
    qids = sorted({q for q, _ in qterm_rows})
    q_idx = {q: i for i, q in enumerate(qids)}
    qind = np.zeros((len(qids), len(terms)), dtype=np.int64)
    for q, t in qterm_rows:
        qind[q_idx[q], t_idx[t]] = 1
    bc = spark.sparkContext.broadcast((qind, t_idx, np.array(qids)))

    def score(batches):
        qind_, t_idx_, qids_ = bc.value
        nq = qind_.shape[0]
        # the two dense per-task planes are |terms| × chunk int64 each:
        # shrink the doc chunk when the batch vocabulary is wide so a
        # task stays ≤ ~256 MB wherever the two caps bind
        chunk = max(
            64, min(_KERNEL_DOC_CHUNK, 16_777_216 // max(1, len(t_idx_)))
        )

        def emit(pdf):
            docs = pdf[id_col].to_numpy(dtype=np.int64)
            udocs, dinv = np.unique(docs, return_inverse=True)
            trow = np.array(
                [t_idx_[t] for t in pdf["__t"]], dtype=np.int64
            )
            nanos = pdf["__p"].to_numpy(dtype=np.int64)
            for lo in range(0, len(udocs), chunk):
                hi = min(lo + chunk, len(udocs))
                sel = (dinv >= lo) & (dinv < hi)
                cols = dinv[sel] - lo
                P = np.zeros((len(t_idx_), hi - lo), dtype=np.int64)
                P[trow[sel], cols] = nanos[sel]
                present = np.zeros((len(t_idx_), hi - lo), dtype=np.int64)
                present[trow[sel], cols] = 1
                acc = qind_ @ P  # exact int64 nano sums
                hit = (qind_ @ present) > 0
                take = min(k, hi - lo)
                for qi in range(nq):
                    row = acc[qi]
                    mask = hit[qi]
                    if not mask.any():
                        continue
                    cand = np.nonzero(mask)[0]
                    if len(cand) > take:
                        # partial top-k on raw nanos, WIDENED by one
                        # rounding quantum (1000 nano = 1e-6): the global
                        # rank uses the ROUND-6 score, and two nanos
                        # within 2000 of each other can round equal (then
                        # tie-break by doc id) — the widened cut is a
                        # provable superset of the join plan's top-k, the
                        # final window settles it
                        kth = np.partition(row[cand], len(cand) - take)[
                            len(cand) - take
                        ]
                        cand = cand[row[cand] >= kth - 2000]
                    yield pd.DataFrame(
                        {
                            query_id_col: qids_[qi],
                            id_col: udocs[lo:][cand],
                            "__nano": row[cand],
                        }
                    )

        # rows arrive SORTED by doc id within the partition (the
        # sortWithinPartitions below), so each Arrow batch is processed
        # as it streams in — memory ∝ one batch, not the partition's
        # matched postings — and only the batch's LAST doc can continue
        # into the next batch: hold its rows back and prepend them.
        carry = None
        for pdf in batches:
            if not len(pdf):
                continue
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
            docs = pdf[id_col].to_numpy(dtype=np.int64)
            cut = int(np.searchsorted(docs, docs[-1], side="left"))
            carry = pdf.iloc[cut:]
            pdf = pdf.iloc[:cut]
            if len(pdf):
                yield from emit(pdf)
        if carry is not None and len(carry):
            yield from emit(carry)

    nparts = spark.sparkContext.defaultParallelism
    partial = (
        part_df.repartition(nparts, id_col)
        .sortWithinPartitions(id_col)
        .mapInPandas(
            score,
            schema=f"{query_id_col} long, {id_col} long, __nano long",
        )
    )
    # nano → the exact double the decimal path produces (sum ≪ 2⁵³), so
    # the final round-6 and tie-break match the join plan bit-for-bit;
    # BOTH id columns cast back to their input dtypes (the Arrow schema
    # above is fixed at long) so kernel and join return one schema
    scored = partial.select(
        F.col(query_id_col).cast(query_id_type).alias(query_id_col),
        F.col(id_col).cast(doc_id_type).alias(id_col),
        F.round(
            (F.col("__nano") / F.lit(1_000_000_000.0)).cast("double"), 6
        ).alias("score"),
    )
    order = [F.col("score").desc(), F.col(id_col).asc()]
    return topk_window(scored, [query_id_col], order, k)


class BM25Index:
    """Persisted BM25 postings artifact: build once, query many.

    ``bm25_topk`` re-tokenizes the corpus per query batch — right for
    ad-hoc calls, wrong as the steady state: at 100 TB the postings build
    is ONE corpus-shaped job whose output is an artifact (exactly the
    index/centroids split the ANN side has), and a query batch then
    touches only `|postings ∩ query terms|` rows of it.

    Layout under ``uri``:
      - ``postings/``  (term, doc_id, tf, dl) — dl denormalized so the
        query path needs NO doc-length join; parquet, repartitioned by
        term so a term's posting list is one row-group neighborhood and
        the query-term hash join prunes cleanly (bucketing-by-term is the
        cluster upgrade, ``sources/bucketed.py``).
      - ``term_stats/`` (term, df) — one small frame.
      - ``postings_batches/batch=N/`` + ``term_stats_batches/batch=N/``
        — ``add_documents`` increments, staged outside the flat dirs and
        visible ONLY once meta lists the batch id (crash-atomic commit:
        the meta flip is the single commit point, mirroring the ANN
        side's snapshot-pointer discipline in ``storage.py``).
      - ``tombstones/batch=N/`` + negative-df ``term_stats_batches``
        deltas — ``remove_documents`` (same staged-batch discipline);
        ``consolidate()`` folds all batch debt into fresh
        ``postings_gen<g>/`` + ``term_stats_gen<g>/`` dirs swapped in by
        generation pointers in meta.
      - ``_bm25_meta.json`` — N, Σdl, column names, committed add/delete
        batch ids, generation dir pointers (corpus-global scalars become
        literals in query plans: no stats cross-join at all).

    Scores are bit-identical to :func:`bm25_topk` (same decimal
    quantization, same tie-break) — pinned by a parity test.
    """

    def __init__(self, spark: SparkSession, uri: str):
        from tiledb_vector_search_spark.storage import HadoopFS

        self.spark = spark
        self.uri = uri.rstrip("/")
        fs = HadoopFS(spark, self.uri)
        self.meta = json.loads(
            fs.read_text(posixpath.join(self.uri, BM25_META_FILE))
        )

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        uri: str,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_partitions: int | None = None,
    ) -> "BM25Index":
        """Tokenize → tf → dl → write (term, doc, tf, dl) + (term, df) + stats.

        One pass over the corpus text; the tf frame feeds dl, df, and the
        postings write from a single cached intermediate, released before
        return (the dedup pipelines' session-hygiene contract).
        """
        from pyspark import StorageLevel

        from tiledb_vector_search_spark.storage import HadoopFS

        uri = uri.rstrip("/")
        tok = docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
        ).where(F.col("term") != "")
        tf = (
            tok.groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
            stats = dl.agg(
                F.count("*").alias("n"), F.sum("dl").alias("sumdl")
            ).first()
            postings = tf.join(dl, "doc_id").select("term", "doc_id", "tf", "dl")
            # EXPLICIT partition count: `repartition("term")` alone lets
            # AQE coalesce a small build to ONE output file, and the query
            # side then runs its whole broadcast-join pipeline (postings
            # scan → expansion → partial aggregate) in a single task —
            # measured 3× slower than the one-shot at bench SF.  A fixed
            # fan-out keeps the scan parallel at any corpus size.
            nparts = num_partitions or spark.sparkContext.defaultParallelism
            postings = postings.repartition(nparts, "term")
            # independent writes on disjoint dirs over the persisted tf
            # (materialized by the stats job above) — overlap them so the
            # df job's tasks back-fill the postings write's tail
            # (guide §2.6)
            from concurrent.futures import ThreadPoolExecutor

            def _w_postings():
                postings.write.mode("overwrite").parquet(
                    posixpath.join(uri, BM25_POSTINGS_DIR)
                )

            def _w_dfreq():
                tf.groupBy("term").agg(F.count("*").alias("df")).write.mode(
                    "overwrite"
                ).parquet(posixpath.join(uri, BM25_DFREQ_DIR))

            with ThreadPoolExecutor(max_workers=2) as pool:
                for f in [pool.submit(_w_postings), pool.submit(_w_dfreq)]:
                    f.result()
        finally:
            tf.unpersist()
        HadoopFS(spark, uri).write_text_atomic(
            posixpath.join(uri, BM25_META_FILE),
            json.dumps(
                {
                    "n_docs": int(stats["n"] or 0),
                    "sum_dl": int(stats["sumdl"] or 0),
                    "id_col": id_col,
                    # recorded so the SQL TVF's fixed `doc_id long`
                    # schema can refuse string-keyed indexes with a
                    # clear error instead of an opaque pyarrow crash
                    "doc_id_type": dict(docs.dtypes)[id_col],
                    "text_col": text_col,
                    "batches": [],
                }
            ),
        )
        return cls(spark, uri)

    def _dirs(
        self, base: str, batches_base: str, batch_ids: list[int]
    ) -> list[str]:
        """Committed data locations: the base dir (resolved through the
        meta GENERATION POINTER, so ``consolidate`` can swap in a folded
        dir atomically) plus every META-LISTED increment batch dir.  A
        batch dir not in meta is an uncommitted orphan from a crashed
        ``add_documents``/``remove_documents`` and stays invisible — the
        same snapshot-pointer discipline the ANN side's ``storage.py``
        uses (write everything, flip the pointer last, readers resolve
        only through the pointer)."""
        dirs = [posixpath.join(self.uri, base)]
        for b in batch_ids:
            dirs.append(posixpath.join(self.uri, batches_base, f"batch={b}"))
        return dirs

    def _add_batches(self) -> list:
        # entries are ints in pre-fence artifacts and "<ordinal>-<nonce>"
        # strings since (the nonce makes CONCURRENT writers' staged dirs
        # collision-free: a fenced-off zombie's orphan dir can never
        # overwrite a committed batch's data, because no two mutation
        # attempts ever share a dir name); both forms map to a
        # ``batch=<entry>`` dir
        return list(self.meta.get("batches", []))

    def _delete_batches(self) -> list:
        return list(self.meta.get("delete_batches", []))

    def _postings_dirs(self) -> list[str]:
        return self._dirs(
            self.meta.get("postings_dir", BM25_POSTINGS_DIR),
            BM25_POSTINGS_BATCHES_DIR,
            self._add_batches(),
        )

    def _dfreq_dirs(self) -> list[str]:
        # delete batches contribute NEGATIVE df deltas; the query-side
        # per-term sum nets them out exactly
        return self._dirs(
            self.meta.get("term_stats_dir", BM25_DFREQ_DIR),
            BM25_DFREQ_BATCHES_DIR,
            self._add_batches() + self._delete_batches(),
        )

    def _tombstone_dirs(self) -> list[str]:
        return [
            posixpath.join(self.uri, BM25_TOMBSTONES_DIR, f"batch={b}")
            for b in self._delete_batches()
        ]

    def _read_dirs(self, dirs: list[str]) -> DataFrame:
        """Reader over a committed dir set with the RESOLUTION (file
        listing + schema inference, ~0.1 s of driver round-trips per
        call once an index carries batch dirs) memoized per committed
        state: the dir tuple embeds the generation pointer and every
        batch nonce, so any mutation changes the key.  A reader/plan
        cache, not a result cache — each action still reads parquet."""
        from tiledb_vector_search_spark.storage import (
            cached_snapshot_artifact,
        )

        key = ("bm25_tree_df", id(self.spark), self.uri, tuple(dirs))
        return cached_snapshot_artifact(
            key, lambda: self.spark.read.parquet(*dirs)
        )

    def _tombstones(self) -> DataFrame | None:
        """Deleted doc ids across all committed delete batches, or None
        when the index has no deletes (keeps clean-index query plans
        free of a no-op anti-join)."""
        dirs = self._tombstone_dirs()
        if not dirs:
            return None
        return self._read_dirs(dirs).select("doc_id").distinct()

    @property
    def n_docs(self) -> int:
        return int(self.meta["n_docs"])

    @property
    def sum_dl(self) -> int:
        return int(self.meta["sum_dl"])

    @property
    def batch_debt(self) -> int:
        """Un-consolidated increment dirs — the signal to run
        :meth:`consolidate`.  META-ONLY (no Spark job): per-batch loops
        like ``streaming/bm25_ingest.py`` read this every micro-batch;
        ``describe()`` adds corpus-scale vocab/postings counts on top
        and is NOT a per-batch call."""
        return len(self._add_batches()) + len(self._delete_batches())

    def describe(self) -> dict:
        """Operational snapshot (the lexical twin of ``Index.describe``):
        corpus stats from meta plus vocabulary size and postings volume.

        On a never-grown index term_stats holds exactly one row per term,
        so vocab is a plain row count (parquet footer metadata — no
        term-keyed shuffle); only an index with batch debt (where a term
        can appear in several batches, or net to zero df after deletes)
        pays the vocab-sized aggregate.  ``batch_debt`` is the number of
        un-consolidated increment dirs — the signal to run
        :meth:`consolidate`."""
        add_b, del_b = self._add_batches(), self._delete_batches()
        dfreq = self.spark.read.parquet(*self._dfreq_dirs())
        if add_b or del_b:
            vocab = (
                dfreq.groupBy("term")
                .agg(F.sum("df").alias("df"))
                .where(F.col("df") > 0)
                .count()
            )
        else:
            vocab = dfreq.count()
        postings = self.spark.read.parquet(*self._postings_dirs())
        tomb = self._tombstones()
        if tomb is not None:
            postings = postings.join(tomb, "doc_id", "left_anti")
        return {
            "uri": self.uri,
            "n_docs": self.n_docs,
            "sum_dl": self.sum_dl,
            "avg_doc_len": (self.sum_dl / self.n_docs) if self.n_docs else 0.0,
            "vocab_size": vocab,
            "postings_rows": postings.count(),
            "batch_debt": len(add_b) + len(del_b),
        }

    @locked_mutation
    def add_documents(
        self, docs: DataFrame, idempotency_key: str | None = None
    ) -> None:
        """Incremental corpus growth: tokenize ONLY the new documents,
        append their postings and per-term df deltas, bump the corpus
        stats — the crawl-increment steady state (cost proportional to
        the increment, like ``minhash_dedup_against``'s reference-corpus
        reuse; the existing corpus never re-tokenizes).

        ``term_stats`` becomes append-only (df summed per term at query
        time — one tiny vocab-sized aggregate); new doc ids must not
        collide with existing ones (same contract as index ingest), and
        a currently-TOMBSTONED id raises: the query-time delete mask is
        id-keyed, so a re-add before ``consolidate()`` would be silently
        invisible — consolidate first (it drops the masked rows and
        clears the tombstones, after which the id is free again).
        Scores after add == scores of a fresh build over the union,
        pinned by a parity test.

        CRASH-ATOMIC: the batch's postings and term-stats land in staged
        ``batch=<id>`` dirs that no reader resolves, and the SINGLE
        commit point is the atomic meta rewrite that lists the batch id
        (and bumps N/Σdl in the same write).  A crash at any earlier
        point leaves the index byte-identical to before the call; a
        retry reuses the id and overwrites the orphan dirs.

        ``idempotency_key``: when set, the key is recorded in the SAME
        atomic meta flip that commits the batch, and a later call with
        an already-recorded key is a NO-OP.  This is the exactly-once
        handle for at-least-once delivery (Structured Streaming
        ``foreachBatch`` re-runs a batch after a crash between the
        commit and the sink checkpoint — ``streaming/bm25_ingest.py``
        keys each micro-batch as ``<stream_id>:<batch_id>``).  Keys
        survive ``consolidate()`` (the fold rewrites pointers, not the
        applied-key ledger).
        """
        from tiledb_vector_search_spark.storage import (
            HadoopFS,
            fenced_meta_flip,
        )

        if idempotency_key is not None and idempotency_key in self.meta.get(
            "applied_keys", []
        ):
            return  # this increment already committed — re-delivery no-op
        id_col = self.meta["id_col"]
        text_col = self.meta["text_col"]
        tok = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("term"),
        ).where(F.col("term") != "")
        tomb = self._tombstones()
        if tomb is not None:
            # tombstones carry the index's own doc-id type (string ids
            # are first-class here); casting the incoming ids to LONG
            # made the semi-join miss every string id, silently letting
            # a tombstoned doc re-enter masked by the delete filter
            tomb_type = dict(tomb.dtypes)["doc_id"]
            hit = (
                docs.select(F.col(id_col).cast(tomb_type).alias("doc_id"))
                .join(tomb, "doc_id", "semi")
                .limit(1)
                .count()
            )
            if hit:
                raise ValueError(
                    "add_documents: an id is currently tombstoned; "
                    "re-adding it would be masked by the delete filter "
                    "— run consolidate() first"
                )
        from pyspark import StorageLevel

        # the tf frame feeds the stats probe, the postings write, and
        # the term-stats write — persist so the increment tokenizes
        # ONCE, not three times (build() applies the same cache for the
        # same reason; stream_bm25_ingest pays this per micro-batch)
        tf = (
            tok.groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        stats = dl.agg(
            F.count("*").alias("n"), F.sum("dl").alias("sumdl")
        ).first()
        committed = self.meta.get("batches", [])
        bid = self._next_batch_id()
        # r11 opt (guide §6 small files): size the batch dir's file count
        # by the INCREMENT, not the core count — a small micro-batch
        # previously wrote defaultParallelism (e.g. 32) near-empty files
        # per batch, and every subsequent query/match pays the per-file
        # open cost across all batch dirs.  ~2M postings rows per file
        # (the stats job already computed the increment's token count,
        # so this costs no extra job); large increments keep full write
        # parallelism up to defaultParallelism.
        parts = max(
            1,
            min(
                self.spark.sparkContext.defaultParallelism,
                int(stats["sumdl"] or 0) // 2_000_000 + 1,
            ),
        )
        # the two batch writes are independent jobs on disjoint staged
        # dirs over the SAME persisted tf frame — submit them from driver
        # threads so the second job's tasks back-fill the first's tail
        # (guide §2.6; the MinHashReference ingest uses the identical
        # pattern).  The stats job above already materialized the cache,
        # so neither thread races the tokenize lineage.
        from concurrent.futures import ThreadPoolExecutor

        def _w_postings():
            tf.join(dl, "doc_id").select(
                "term", "doc_id", "tf", "dl"
            ).repartition(parts, "term").write.mode("overwrite").parquet(
                posixpath.join(
                    self.uri, BM25_POSTINGS_BATCHES_DIR, f"batch={bid}"
                )
            )

        def _w_dfreq():
            tf.groupBy("term").agg(F.count("*").alias("df")).coalesce(
                parts
            ).write.mode("overwrite").parquet(
                posixpath.join(
                    self.uri, BM25_DFREQ_BATCHES_DIR, f"batch={bid}"
                )
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(_w_postings), pool.submit(_w_dfreq)]
            for f in futs:
                f.result()
        # commit point: one atomic meta flip makes the batch visible and
        # the corpus stats consistent with it — FENCED against concurrent
        # writers (a zombie stream's stale handle raises instead of
        # silently dropping this or the competing batch; in-memory state
        # only adopts the commit on success)
        new_meta = {
            **self.meta,
            "n_docs": self.n_docs + int(stats["n"] or 0),
            "sum_dl": self.sum_dl + int(stats["sumdl"] or 0),
            "batches": list(committed) + [bid],
        }
        if idempotency_key is not None:
            # bounded ledger: at-least-once delivery only ever replays a
            # small recent window (Structured Streaming re-runs the one
            # unacknowledged batch), so the tail is all a no-op check
            # needs — a year of micro-batches must not bloat the meta
            new_meta["applied_keys"] = (
                list(self.meta.get("applied_keys", [])) + [idempotency_key]
            )[-1024:]
        try:
            self.meta = fenced_meta_flip(
                HadoopFS(self.spark, self.uri),
                posixpath.join(self.uri, BM25_META_FILE),
                new_meta,
                int(self.meta.get("meta_version", 0)),
            )
        finally:
            tf.unpersist()

    def _next_batch_id(self) -> str:
        """Mint a batch ENTRY: a monotonic ordinal (readable ordering,
        unique across add and delete batches — both kinds write a
        term_stats_batches/batch=<entry> dir) plus a random nonce that
        makes the staged dir name unique PER MUTATION ATTEMPT.  Without
        the nonce, two concurrent writers mint the same ordinal and the
        loser's ``mode("overwrite")`` data write clobbers the winner's
        committed dirs BEFORE the meta fence can refuse its flip — the
        fence would raise, but the data would already be corrupt."""
        ordinal = (
            max(
                [0]
                + [
                    int(str(e).split("-")[0])
                    for e in self._add_batches() + self._delete_batches()
                ]
            )
            + 1
        )
        return f"{ordinal}-{uuid.uuid4().hex[:8]}"

    @locked_mutation
    def remove_documents(self, ids: DataFrame) -> None:
        """Tombstone deletes — the lexical twin of the ANN side's
        updates-log delete (reference DML surface: ``index.py:418-501``).

        ``ids``: a one-column DataFrame of doc ids.  Cost is one scan of
        the committed postings joined against the id set (needed to
        decrement N/Σdl and per-term df EXACTLY); the postings files are
        never rewritten — the delete lands as a batch of (a) tombstoned
        doc ids and (b) negative df deltas in term_stats, so post-delete
        scores equal a fresh build over the surviving corpus (same
        integer stats, same surviving postings rows, same quantization).

        CRASH-ATOMIC like ``add_documents``: staged ``batch=<id>`` dirs
        are invisible until the single atomic meta flip that lists the
        batch under ``delete_batches`` and decrements the corpus stats.
        Ids not present in the index (or already deleted) are no-ops —
        stats only move for docs whose postings were actually found.
        """
        from pyspark import StorageLevel

        from tiledb_vector_search_spark.storage import (
            HadoopFS,
            fenced_meta_flip,
        )

        post = self.spark.read.parquet(*self._postings_dirs())
        # align the caller's ids to the INDEX's doc-id type — the old
        # unconditional cast("long") turned every id on a string-keyed
        # index into NULL, the isNotNull filter dropped them ALL, and
        # the delete silently NO-OP'd (the caller saw success while the
        # docs stayed searchable — a data-retention bug)
        doc_id_type = dict(post.dtypes)["doc_id"]
        raw = F.col(ids.columns[0])
        # an id that does not CONVERT to the index's doc-id type must
        # raise, not be filtered: the isNotNull() below would drop
        # every such id and the delete would report success while the
        # docs stayed searchable — the same data-retention bug class as
        # the string-keyed no-op fixed in r9, from the other direction.
        # try_cast (not cast) because ANSI mode makes a failed cast
        # throw an opaque executor error instead of yielding NULL.
        unparseable = ids.where(
            raw.isNotNull() & raw.try_cast(doc_id_type).isNull()
        )
        if not unparseable.isEmpty():
            sample = [r[0] for r in unparseable.limit(3).collect()]
            raise TypeError(
                f"remove_documents: id column {ids.columns[0]!r} has "
                f"values that do not convert to the index's doc_id type "
                f"{doc_id_type!r} (e.g. {sample}) — deleting would "
                "silently skip them.  Pass ids of the index's key type."
            )
        del_ids = (
            ids.select(raw.try_cast(doc_id_type).alias("doc_id"))
            .where(F.col("doc_id").isNotNull())
            .distinct()
        )
        tomb = self._tombstones()
        if tomb is not None:
            del_ids = del_ids.join(tomb, "doc_id", "left_anti")
        del_post = post.join(del_ids, "doc_id").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            # dl is denormalized per posting row → one row per doc first
            doc_dl = del_post.groupBy("doc_id").agg(F.first("dl").alias("dl"))
            stats = doc_dl.agg(
                F.count("*").alias("n"), F.sum("dl").alias("sumdl")
            ).first()
            n_del = int(stats["n"] or 0)
            if n_del == 0:
                return  # nothing to delete: index byte-identical
            bid = self._next_batch_id()
            # same §2.6 overlap as add_documents: two independent staged
            # writes over the persisted del_post frame
            from concurrent.futures import ThreadPoolExecutor

            def _w_dfreq():
                del_post.groupBy("term").agg(
                    (-F.count("*")).cast("long").alias("df")
                ).write.mode("overwrite").parquet(
                    posixpath.join(
                        self.uri, BM25_DFREQ_BATCHES_DIR, f"batch={bid}"
                    )
                )

            def _w_tomb():
                doc_dl.select("doc_id").write.mode("overwrite").parquet(
                    posixpath.join(
                        self.uri, BM25_TOMBSTONES_DIR, f"batch={bid}"
                    )
                )

            with ThreadPoolExecutor(max_workers=2) as pool:
                for f in [pool.submit(_w_dfreq), pool.submit(_w_tomb)]:
                    f.result()
        finally:
            del_post.unpersist()
        # commit point: one atomic meta flip, fenced like add_documents
        self.meta = fenced_meta_flip(
            HadoopFS(self.spark, self.uri),
            posixpath.join(self.uri, BM25_META_FILE),
            {
                **self.meta,
                "n_docs": self.n_docs - n_del,
                "sum_dl": self.sum_dl - int(stats["sumdl"] or 0),
                "delete_batches": self._delete_batches() + [bid],
            },
            int(self.meta.get("meta_version", 0)),
        )

    @locked_mutation
    def consolidate(self) -> None:
        """Fold every committed add/delete batch into fresh base dirs —
        the lexical twin of the ANN side's ``consolidate_updates``
        (reference ``index.py:503-577``).

        After hundreds of crawl increments the per-batch layout is a
        small-files problem and a vocab-sized re-aggregate per query
        batch (VERDICT r6 "What's wrong #1"); the fold restores the
        one-dir steady state: postings = union of committed postings
        minus tombstoned docs, term_stats = per-term net df (dropping
        terms at df ≤ 0), N/Σdl unchanged (maintained at DML time).

        CRASH-SAFE via generation pointers: the folded data lands in
        ``postings_gen<g>/`` + ``term_stats_gen<g>/`` which no reader
        resolves, then ONE atomic meta flip repoints ``postings_dir`` /
        ``term_stats_dir`` and empties the batch lists.  A crash before
        the flip leaves the index byte-identical (a retry overwrites the
        orphan gen dirs); after the flip the old dirs are garbage and
        are deleted best-effort (a crash there leaves unreferenced dirs
        only).  Query results are BIT-IDENTICAL before and after —
        pinned by parity tests.
        """
        from tiledb_vector_search_spark.storage import (
            HadoopFS,
            fenced_meta_flip,
        )

        add_b, del_b = self._add_batches(), self._delete_batches()
        if not add_b and not del_b:
            return  # zero debt: nothing to fold
        gen = int(self.meta.get("generation", 0)) + 1
        new_post = f"{BM25_POSTINGS_DIR}_gen{gen}"
        new_stats = f"{BM25_DFREQ_DIR}_gen{gen}"

        postings = self.spark.read.parquet(*self._postings_dirs())
        tomb = self._tombstones()
        if tomb is not None:
            postings = postings.join(tomb, "doc_id", "left_anti")
        nparts = self.spark.sparkContext.defaultParallelism
        postings.repartition(nparts, "term").write.mode("overwrite").parquet(
            posixpath.join(self.uri, new_post)
        )
        self.spark.read.parquet(*self._dfreq_dirs()).groupBy("term").agg(
            F.sum("df").alias("df")
        ).where(F.col("df") > 0).write.mode("overwrite").parquet(
            posixpath.join(self.uri, new_stats)
        )

        old_post_dirs = self._postings_dirs() + self._tombstone_dirs()
        old_stats_dirs = self._dfreq_dirs()
        # commit point: one atomic meta flip swaps the generation in and
        # zeroes the batch debt — fenced, so a fold racing a concurrent
        # add cannot resurrect folded batches or orphan the add
        fs = HadoopFS(self.spark, self.uri)
        self.meta = fenced_meta_flip(
            fs,
            posixpath.join(self.uri, BM25_META_FILE),
            {
                **self.meta,
                "postings_dir": new_post,
                "term_stats_dir": new_stats,
                "generation": gen,
                "batches": [],
                "delete_batches": [],
            },
            int(self.meta.get("meta_version", 0)),
        )
        # post-commit GC: the old generation + batch dirs are no longer
        # referenced by any reader; failure here cannot corrupt the index
        # (a crashed GC just leaves unreferenced dirs for the next pass)
        for d in old_post_dirs + old_stats_dirs:
            fs.delete(d)

    @locked_mutation
    def vacuum_orphans(self) -> list[str]:
        """Delete staged batch dirs no committed meta references —
        leftovers of crashed mutations and of fenced-off concurrent
        writers (the fence deliberately abandons the loser's staged
        dirs rather than risk touching the winner's).  Readers resolve
        dirs only through meta, so an orphan is invisible by
        construction; this just reclaims the bytes.  The writer lease
        serializes it against live mutations — unserialized, a vacuum
        racing an in-flight add would reclaim the add's staged dirs
        moments before their commit.
        Returns the deleted paths."""
        from tiledb_vector_search_spark.storage import HadoopFS

        fs = HadoopFS(self.spark, self.uri)
        live = {
            posixpath.basename(d)
            for d in self._postings_dirs()
            + self._dfreq_dirs()
            + self._tombstone_dirs()
        }
        deleted = []
        for tree in (
            BM25_POSTINGS_BATCHES_DIR,
            BM25_DFREQ_BATCHES_DIR,
            BM25_TOMBSTONES_DIR,
        ):
            root = posixpath.join(self.uri, tree)
            for name in fs.listdir(root):
                if name.startswith("batch=") and name not in live:
                    path = posixpath.join(root, name)
                    if fs.delete(path):
                        deleted.append(path)
        return deleted

    def query(
        self,
        queries: DataFrame,
        k: int = 10,
        k1: float = DEFAULT_K1,
        b: float = DEFAULT_B,
        query_id_col: str = "query_id",
        query_text_col: str = "query_text",
        strategy: str = "auto",
    ) -> DataFrame:
        """Top-k per query FROM THE ARTIFACT: reads only the postings and
        term-stats rows matching the query terms (predicate reaches the
        parquet scan via the hash join; corpus text is never touched).

        ``strategy``: ``join`` scores through the (query, term, doc)
        expansion + aggregate (any batch size); ``kernel`` repartitions
        the matched partials by doc once and scores every query
        per-partition as an exact int64 indicator-matmul (the kNN-kernel
        shape — no expansion shuffle; bounded query batches only);
        ``auto`` picks the kernel for integral-id batches of ≤
        ``BM25_KERNEL_MAX_NQ`` queries AND ≤ ``BM25_KERNEL_MAX_TERMS``
        distinct terms — both axes checked from ONE limit-collect of the
        exploded pairs (≤ ``BM25_KERNEL_MAX_PAIRS`` rows ever reach the
        driver; the same collect feeds the kernel, so choosing it costs
        zero extra jobs).  Explicit ``strategy="kernel"`` probes each
        axis with its own bounded job so the error names the broken cap.
        Both strategies are BIT-IDENTICAL (pinned by test), including
        the result schema — the kernel casts the query-id column back
        to the input type."""
        id_col = self.meta["id_col"]
        qterms = _explode_query_terms(queries, query_id_col, query_text_col)
        qt_distinct = qterms.select("__t").distinct()
        raw = self._read_dirs(self._postings_dirs())
        tomb = self._tombstones()
        if tomb is not None:
            # deletes are tombstones, not rewrites: mask deleted docs'
            # postings here (df/N/Σdl are already net of them)
            raw = raw.join(tomb, "doc_id", "left_anti")
        postings = raw.select(
            F.col("term").alias("__t"),
            F.col("doc_id").alias(id_col),
            F.col("tf").alias("__tf"),
            F.col("dl").alias("__dl"),
        )
        # term_stats is append-only under add_documents: sum the per-batch
        # df rows per term (a vocab-sized aggregate; one row per term on a
        # never-updated index)
        dfreq = (
            self._read_dirs(self._dfreq_dirs())
            .groupBy(F.col("term").alias("__t"))
            .agg(F.sum("df").alias("__df"))
        )
        post = (
            postings.join(qt_distinct, "__t")
            .join(dfreq.join(qt_distinct, "__t"), "__t")
            .withColumn("__n", F.lit(self.n_docs))
            .withColumn("__sumdl", F.lit(self.sum_dl))
        )
        return _dispatch_matched_scoring(
            post, qterms, qt_distinct, k, k1, b, id_col, query_id_col,
            strategy,
            dict(queries.dtypes).get(query_id_col, ""),
            dict(raw.dtypes).get("doc_id", ""),
            queries_df=queries,
        )


def _dispatch_matched_scoring(
    post: DataFrame,
    qterms: DataFrame,
    qt_distinct: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
    query_id_col: str,
    strategy: str,
    qid_type: str,
    doc_type: str,
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """Scoring-tail dispatch over a matched-postings frame, shared by
    the artifact query path (``BM25Index.query``) and the one-shot
    :func:`bm25_topk`: the exact int64 doc-partitioned kernel for
    bounded integral-id batches, the (query, term, doc) expansion join
    plan otherwise.  Both tails are BIT-IDENTICAL in output (pinned by
    test); only the physical plan differs."""
    if strategy not in ("auto", "join", "kernel"):
        raise ValueError(f"unknown strategy: {strategy}")
    integral = ("bigint", "int", "smallint", "tinyint")
    use_kernel = strategy == "kernel"
    if strategy == "auto":
        # BOTH id axes must be integral for the kernel: it rides an
        # int64 Arrow schema, so a string doc-id corpus would crash
        # every task and a fractional query id would truncate —
        # auto quietly keeps the join plan instead
        use_kernel = qid_type in integral and doc_type in integral
    if use_kernel and strategy == "kernel":
        # explicit kernel: probe each cap with its own bounded job so
        # the error names the axis that broke (perf is secondary on
        # the explicit path — the caller asked for this plan)
        if qid_type not in integral:
            raise ValueError(
                f"kernel strategy needs an integral {query_id_col} "
                f"column (got {qid_type or 'missing'}): int() on a "
                "fractional id would silently merge queries; use "
                "strategy='join' or cast the ids"
            )
        if doc_type not in integral:
            raise ValueError(
                "kernel strategy needs an integral doc-id column in "
                f"the index (got {doc_type or 'missing'}): the "
                "kernel's Arrow schema is int64; use strategy='join'"
            )
        probe = (
            (queries_df if queries_df is not None else qterms)
            .select(query_id_col)
            .distinct()
            .limit(BM25_KERNEL_MAX_NQ + 1)
            .count()
        )
        if probe > BM25_KERNEL_MAX_NQ:
            raise ValueError(
                f"kernel strategy caps at {BM25_KERNEL_MAX_NQ} "
                f"queries (got > {BM25_KERNEL_MAX_NQ}); use "
                "strategy='join'"
            )
        if (
            qt_distinct.limit(BM25_KERNEL_MAX_TERMS + 1).count()
            > BM25_KERNEL_MAX_TERMS
        ):
            raise ValueError(
                "kernel strategy caps at "
                f"{BM25_KERNEL_MAX_TERMS} distinct query terms "
                "(the broadcast indicator matrix and dense "
                "per-task planes grow with the batch "
                "vocabulary); use strategy='join'"
            )
        # the axis caps passed — honor the explicit request even if
        # the PAIR count exceeds auto's fallback bar (the caller
        # owns the driver-memory trade)
        qterm_rows = [
            (int(r[query_id_col]), r["__t"]) for r in qterms.collect()
        ]
        if qterm_rows:
            return _score_matched_postings_kernel(
                _partial_nanos(post, k1, b, id_col),
                qterm_rows, k, id_col, query_id_col,
                query_id_type=qid_type or "long",
                doc_id_type=doc_type or "long",
            )
        use_kernel = False  # all-empty query texts: join plan
    if use_kernel:
        # ONE bounded job probes BOTH broadcast axes AND fetches the
        # pairs the kernel needs: a limit-collect of the exploded
        # (query, term) frame.  A huge integral-id batch (too many
        # queries) or a decontamination-style batch of
        # document-length queries (too many distinct terms →
        # multi-GB indicator matrix and dense per-task planes) blows
        # the pair cap or an axis cap and falls back to the join
        # plan — the driver transfer stays ≤ the pair cap either way
        rows = qterms.limit(BM25_KERNEL_MAX_PAIRS + 1).collect()
        if len(rows) > BM25_KERNEL_MAX_PAIRS:
            use_kernel = False  # bigger than any legit kernel batch
        else:
            qterm_rows = [
                (int(r[query_id_col]), r["__t"]) for r in rows
            ]
            nq = len({q for q, _ in qterm_rows})
            nt = len({t for _, t in qterm_rows})
            if (
                qterm_rows
                and nq <= BM25_KERNEL_MAX_NQ
                and nt <= BM25_KERNEL_MAX_TERMS
            ):
                return _score_matched_postings_kernel(
                    _partial_nanos(post, k1, b, id_col),
                    qterm_rows, k, id_col, query_id_col,
                    query_id_type=qid_type or "long",
                    doc_id_type=doc_type or "long",
                )
            use_kernel = False  # over an axis cap / empty texts
    return _score_matched_postings(
        post, qterms, k, k1, b, id_col, query_id_col
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    materialize: bool = True,
) -> DataFrame:
    """Top-k documents per query by BM25: (query_id, doc_id, score, rank).

    ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))`` (always positive — the
    Lucene form), ``tf_sat = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``,
    score = Σ over DISTINCT query terms of round(idf·tf_sat, 9), reported
    rounded to 6.  Ties rank by doc_id ascending.

    The postings frame feeds FOUR plan branches (dl, stats, df, match) —
    without a cache Spark recomputes the tokenize+count for each, the
    dominant cost.  ``materialize`` (default) persists postings, eagerly
    materializes the (tiny) top-k result, and releases the cache before
    returning — the dedup pipelines' session-hygiene contract.  Pass
    ``False`` for the lazy plan (plan inspection; caller manages reuse).
    """
    from pyspark import StorageLevel

    # drop empty tokens: F.split on a text that normalizes to "" yields
    # [""], which would count phantom docs into N/avgdl — the DuckDB twin
    # filters them (list_filter), so Spark must too or stats diverge
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    ).where(F.col("__t") != "")
    tf = tok.groupBy(id_col, "__t").agg(F.count("*").alias("__tf"))
    if materialize:
        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    dl = tf.groupBy(id_col).agg(F.sum("__tf").alias("__dl"))
    # exact-integer corpus stats: avgdl = Σdl / N computed identically in
    # any engine (single IEEE division of two exact integers)
    stats = dl.agg(
        F.count("*").alias("__n"), F.sum("__dl").alias("__sumdl")
    )

    qterms = _explode_query_terms(queries, query_id_col, query_text_col)

    # The per-(term, doc) partial idf·tf_sat is QUERY-INDEPENDENT, so it
    # is computed ONCE on the query-restricted postings (|postings ∩
    # query terms| rows) and only the precomputed decimal rides the
    # (query, term, doc) expansion — on common terms that's ~|queries|×
    # less ln/division work than scoring per matched row.  Query-side
    # joins are UN-hinted: AQE broadcasts the small term frame at
    # runtime, and a corpus-sized query batch degrades to a shuffle join
    # instead of a forced-broadcast OOM (the dedup candidate-gate
    # lesson).  Only the one-row stats frame is hinted.
    qt_distinct = qterms.select("__t").distinct()
    # df only matters for MATCHED terms: restrict the postings to the
    # query vocabulary BEFORE the per-term aggregate instead of
    # aggregating the full corpus vocabulary and joining afterwards —
    # Catalyst does not push a join below an aggregation, so without
    # this the df pass shuffles every distinct term in the corpus to
    # count rows the join then discards (guide §2.3: shuffle fewer
    # bytes).  Identical result: df(term) counts over the whole cached
    # postings frame, term-restricted only.
    dfreq = (
        tf.join(qt_distinct, "__t")
        .groupBy("__t")
        .agg(F.count("*").alias("__df"))
    )
    post = (
        tf.join(qt_distinct, "__t")
        .join(dl, id_col)
        .join(dfreq, "__t")
        .crossJoin(F.broadcast(stats))
    )
    # the scoring tail dispatches exactly like the artifact path: the
    # int64 doc-partitioned kernel for bounded integral-id batches (the
    # (query, term, doc) expansion never materializes in the JVM —
    # measured as the dominant CPU of this pipeline: a 100-query batch
    # over a dense-vocabulary corpus expanded to ~16M aggregate-input
    # rows under the join plan), the expansion join plan otherwise.
    # Output is bit-identical either way (pinned by test).
    res = _dispatch_matched_scoring(
        post, qterms, qt_distinct, k, k1, b, id_col, query_id_col,
        "auto",
        dict(queries.dtypes).get(query_id_col, ""),
        dict(docs.dtypes).get(id_col, ""),
        queries_df=queries,
    )
    if materialize:
        from tiledb_vector_search_spark.operators.dedup import (
            _materialize_and_release,
        )

        return _materialize_and_release(res, tf)
    return res


def duckdb_bm25_topk_sql(
    docs_table: str,
    queries_cte: str,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — same tokenization, same
    quantization, same tie-break.  ``queries_cte`` must be a SELECT
    producing (query_id, query_text)."""
    from tiledb_vector_search_spark.functions.text import (
        duckdb_normalize_text_sql,
    )

    norm_doc = duckdb_normalize_text_sql("text")
    norm_q = duckdb_normalize_text_sql("query_text")
    return f"""
WITH q AS ({queries_cte}),
tok AS (
  SELECT {id_col}, unnest(list_filter(string_split({norm_doc}, ' '),
                                      x -> x <> '')) AS t
  FROM {docs_table}
),
tf AS (SELECT {id_col}, t, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT {id_col}, sum(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
qt AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(string_split({norm_q}, ' '),
                            x -> x <> '')) AS t
  FROM q
),
scored AS (
  SELECT qt.query_id, tf.{id_col},
         round(CAST(sum(CAST(round(
             ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * ({k1} + 1.0))
             / (tf.tf + {k1} * (1.0 - {b}
                + {b} * dl.dl / (CAST(stats.sumdl AS DOUBLE)
                                 / CAST(stats.n AS DOUBLE)))),
             9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS score
  FROM tf
  JOIN qt USING (t)
  JOIN dl USING ({id_col})
  JOIN dfreq USING (t)
  CROSS JOIN stats
  GROUP BY 1, 2
)
SELECT query_id, {id_col}, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, {id_col}) AS rank
FROM scored
QUALIFY rank <= {k}
ORDER BY query_id, rank
"""


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    k0: float = 60.0,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    lists: ``score(d) = Σ_lists 1/(k0 + rank_i(d))`` — the standard
    hybrid-retrieval merge (BM25 × embedding kNN × near-dup signals)
    that needs only RANKS, so heterogeneous scoring scales never have to
    be calibrated against each other.

    Each input is (query_id, doc_id, rank); the fusion is one unionByName
    + one (query, doc) aggregation + the bounded top-k window — no joins,
    no broadcast, shuffle keyed on (query, doc).  Per-list reciprocal
    ranks quantize to DECIMAL(18,9) before the sum (order-independent,
    oracle-exact); ties rank by doc_id ascending.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        df.select(
            F.col(query_id_col).alias("__q"),
            F.col(id_col).alias("__d"),
            F.round(1.0 / (F.lit(k0) + F.col(rank_col)), 9)
            .cast("decimal(18,9)")
            .alias("__rr"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = (
        u.groupBy("__q", "__d")
        .agg(F.round(F.sum("__rr").cast("double"), 9).alias("score"))
        .select(
            F.col("__q").alias(query_id_col),
            F.col("__d").alias(id_col),
            "score",
        )
    )
    order = [F.col("score").desc(), F.col(id_col).asc()]
    return topk_window(scored, [query_id_col], order, k)
