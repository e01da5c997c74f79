"""ObjectIndex: index + query arbitrary objects through reader + embedding.

Reference: ``object_api/object_index.py:33-1044`` — create/query/update over
(reader, embedding, vector index, metadata array).  Key semantics mirrored:

- metadata filtering with **over-fetch**: ``fetch_k = min(50·k, size)`` when
  a filter is present, then post-filter and truncate to k
  (``object_index.py:451-453,506-523``)
- metadata predicate strings are a SQL-WHERE subset → ``F.expr`` directly
  (``object_index.py:315-324``); pandas row-predicate functions supported
  via an Arrow-batched filter (``:326-333``)
- multi-vector embeddings fuse scores per (query, object): max over vector
  pairs, then sum over query vectors (``_merge_results_per_query``,
  ``:561-635``)
- reader/embedding instances are cloudpickled into the group — the Spark
  analogue of the reference's source-code shipping (``:884-911``)
"""

from __future__ import annotations

import json
import posixpath
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiledb_vector_search_spark.indexes import (
    FlatIndex,
    IVFFlatIndex,
    IVFPQIndex,
    VamanaIndex,
    open_index,
)
from tiledb_vector_search_spark.objects.embeddings import ObjectEmbedding
from tiledb_vector_search_spark.objects.readers import ObjectReader
from tiledb_vector_search_spark.schemas import (
    DISTANCE_COL,
    ID_COL,
    QUERY_ID_COL,
    VECTOR_COL,
)
from tiledb_vector_search_spark.session import small_df
from tiledb_vector_search_spark.storage import (
    LONG_LEASE_TTL_MS,
    HadoopFS,
    locked_mutation,
    now_ms,
)

# the reference's full ObjectIndex family (object_index.py:951-994):
# FLAT / IVF_FLAT / VAMANA / IVF_PQ
_INDEX_TYPES = {
    "FLAT": FlatIndex,
    "IVF_FLAT": IVFFlatIndex,
    "IVF_PQ": IVFPQIndex,
    "VAMANA": VamanaIndex,
}
OVERFETCH_FACTOR = 50  # reference object_index.py:451-453
METADATA_UPDATES_DIR = "object_metadata_updates"


def fuse_multi_vector_scores(
    scored: DataFrame,
    k: int,
    query_col: str = QUERY_ID_COL,
    emb_col: str = "query_emb_id",
    id_col: str = ID_COL,
) -> DataFrame:
    """max-per-(query-vector, object) then sum-per-(query, object) fusion.

    Reference ``_merge_results_per_query`` (``object_index.py:561-635``):
    works on similarity scores (larger = better).  Input needs columns
    (query_col, emb_col, id_col, score).
    """
    per_emb = scored.groupBy(query_col, emb_col, id_col).agg(
        F.max("score").alias("s")
    )
    fused = per_emb.groupBy(query_col, id_col).agg(F.sum("s").alias("score"))
    w = Window.partitionBy(query_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _write_object_group(
    spark: SparkSession,
    uri: str,
    reader: ObjectReader,
    embedding: ObjectEmbedding,
    objects: DataFrame,
    index_type: str,
    ts: int,
) -> None:
    """Persist the group sidecars: metadata table + pickled reader/embedding
    (the Spark analogue of the reference's source-code shipping,
    ``object_index.py:884-911``)."""
    meta_cols = reader.metadata_attributes()
    if meta_cols:
        objects.select(ID_COL, *meta_cols).write.mode("overwrite").parquet(
            posixpath.join(uri, "object_metadata")
        )
    fs = HadoopFS(spark, uri)
    import pickle

    fs.write_bytes_atomic(
        posixpath.join(uri, "_objects.pkl"), pickle.dumps((reader, embedding))
    )
    fs.write_text_atomic(
        posixpath.join(uri, "_object_meta.json"),
        json.dumps({"index_type": index_type, "ts": ts}),
    )


class ObjectIndex:
    """create/open/query an object index (reference ``object_index.py``)."""

    def __init__(
        self,
        spark: SparkSession,
        uri: str,
        timestamp: "int | tuple[int | None, int | None] | None" = None,
    ):
        """``timestamp`` passes through to the vector index untouched —
        including ``(start, end)`` range opens (see ``open_index``); the
        metadata side keys its fold check on the range END (the metadata
        view a windowed read attaches is the one as of its upper
        bound)."""
        self.spark = spark
        self.uri = uri.rstrip("/")
        self._open_ts = timestamp
        fs = HadoopFS(spark, self.uri)
        meta = json.loads(fs.read_text(posixpath.join(self.uri, "_object_meta.json")))
        self.index_type = meta["index_type"]
        import pickle

        blob = fs.read_bytes(posixpath.join(self.uri, "_objects.pkl"))
        self.reader, self.embedding = pickle.loads(blob)
        self.index = open_index(
            spark, posixpath.join(self.uri, "vector_index"), timestamp
        )

    # -- build ----------------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        uri: str,
        reader: ObjectReader,
        embedding: ObjectEmbedding,
        index_type: str = "IVF_FLAT",
        timestamp: int | None = None,
        **ingest_kw: Any,
    ) -> "ObjectIndex":
        """read → embed (mapInPandas) → ingest + metadata table.

        Reference ``ObjectIndex.create`` + ``ingest_embeddings_with_driver``
        (two chained stages of one Spark job here — the embedding output
        flows straight into the index ingest without materialization).
        """
        if index_type not in _INDEX_TYPES:
            raise ValueError(f"unknown index_type {index_type!r}")
        ts = timestamp if timestamp is not None else now_ms()
        uri = uri.rstrip("/")
        objects = reader.read_objects(spark)
        vectors = embedding.transform(objects, reader.payload_columns())
        _INDEX_TYPES[index_type].ingest(
            spark,
            posixpath.join(uri, "vector_index"),
            vectors,
            timestamp=ts,
            **ingest_kw,
        )
        _write_object_group(spark, uri, reader, embedding, objects, index_type, ts)
        return cls(spark, uri)

    # -- metadata --------------------------------------------------------------

    def metadata(self) -> DataFrame | None:
        """The logical metadata table: base ∖ updated ids ∪ latest upserts.

        DML writes land in an append-only ``object_metadata_updates`` log
        (one timestamped batch per call — the reference's sparse-array
        upsert keyed on external_id, ``embeddings_ingestion.py:331-333``);
        reads merge latest-per-id with the same precedence as the vector
        updates log (ts desc, upsert over delete at equal ts).  No
        full-table rewrite per batch — the copy-on-write fold happens
        only in :meth:`consolidate_object_metadata`.
        """
        path = posixpath.join(self.uri, "object_metadata")
        fs = HadoopFS(self.spark, self.uri)
        if not fs.exists(path):
            # a consolidation that crashed between its two renames leaves
            # the table under __backup; read it (recovery promotes it back
            # on the next consolidate call — reads stay side-effect-free)
            backup = posixpath.join(self.uri, "object_metadata__backup")
            if fs.exists(backup):
                path = backup
            else:
                return None
        open_hi = (
            self._open_ts[1]
            if isinstance(self._open_ts, (tuple, list))
            else self._open_ts
        )
        if open_hi is not None:
            # a consolidation folds log history into the base in place:
            # metadata as of an EARLIER timestamp is no longer
            # reconstructible (the log rows are gone) — raise instead of
            # silently returning post-fold values the vector side's
            # time-traveled snapshot diverges from.  For a range open
            # the bound is the range END (None = latest, no check).
            marker = posixpath.join(self.uri, "_object_metadata_meta.json")
            if fs.exists(marker):
                folded = int(
                    json.loads(fs.read_text(marker)).get("folded_through", 0)
                )
                if int(open_hi) < folded:
                    raise ValueError(
                        f"metadata history through ts={folded} was folded "
                        "by consolidate_object_metadata; a handle opened "
                        f"at ts={int(open_hi)} cannot reconstruct "
                        "its metadata view (same contract as a vacuumed "
                        "vector snapshot) — reopen at latest"
                    )
        base = self.spark.read.parquet(path)
        upath = posixpath.join(self.uri, METADATA_UPDATES_DIR)
        if not fs.exists(upath):
            return base
        upd = self.spark.read.parquet(upath)
        if open_hi is not None:
            # range opens window the metadata at the range END: the
            # metadata a windowed vector read attaches is the view as of
            # its upper bound (ids are stable; values travel with time)
            upd = upd.where(F.col("ts") <= F.lit(int(open_hi)))
        w = Window.partitionBy(ID_COL).orderBy(
            F.col("ts").desc(), F.col("is_delete").asc()
        )
        latest = (
            upd.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        survivors = latest.where(~F.col("is_delete")).drop("ts", "is_delete")
        return base.join(
            latest.select(ID_COL), ID_COL, "left_anti"
        ).unionByName(survivors)

    def describe(self) -> dict[str, Any]:
        """Vector-index snapshot (:meth:`Index.describe`) plus the object
        layer: reader/embedding classes, metadata row count, and metadata
        updates-log presence."""
        out = self.index.describe()
        out["object_index_type"] = self.index_type
        out["reader"] = type(self.reader).__name__
        out["embedding"] = type(self.embedding).__name__
        md = self.metadata()
        out["metadata_rows"] = md.count() if md is not None else 0
        out["metadata_updates_pending"] = HadoopFS(self.spark, self.uri).exists(
            posixpath.join(self.uri, METADATA_UPDATES_DIR)
        )
        return out

    # -- DML -------------------------------------------------------------------

    @locked_mutation
    def update_objects(self, objects: DataFrame, timestamp: int | None = None) -> None:
        """Embed and upsert objects into the updates log (reference
        ``update_index`` incremental path) — INCLUDING their metadata,
        which the reference's ingestion upserts into the metadata array
        (``embeddings_ingestion.py:331-333``).  Metadata columns absent
        from the update frame upsert as NULL (the caller declared no
        metadata for the new version)."""
        ts = timestamp if timestamp is not None else now_ms()
        vectors = self.embedding.transform(objects, self.reader.payload_columns())
        self.index.update_batch(vectors, ts)
        self._append_metadata_updates(objects, ts, is_delete=False)

    @locked_mutation
    def delete_objects(self, external_ids: list[int], timestamp: int | None = None) -> None:
        ts = timestamp if timestamp is not None else now_ms()
        self.index.delete_batch(external_ids, ts)
        ids = self.spark.createDataFrame(
            [(int(i),) for i in external_ids], f"{ID_COL} long"
        )
        self._append_metadata_updates(ids, ts, is_delete=True)

    def _append_metadata_updates(
        self, df: DataFrame, ts: int, is_delete: bool
    ) -> None:
        """One timestamped parquet batch in the metadata updates log;
        columns conform to the base metadata schema (absent → NULL)."""
        base = self.metadata()
        if base is None:
            return
        base_fields = {
            f.name: f.dataType for f in base.schema.fields if f.name != ID_COL
        }
        cols = [F.col(ID_COL).cast("long").alias(ID_COL)]
        for name, dtype in base_fields.items():
            src = (
                F.col(name).cast(dtype)
                if name in df.columns
                else F.lit(None).cast(dtype)
            )
            cols.append(src.alias(name))
        out = (
            df.select(*cols)
            .withColumn("ts", F.lit(int(ts)))
            .withColumn("is_delete", F.lit(bool(is_delete)))
        )
        out.write.mode("append").parquet(
            posixpath.join(self.uri, METADATA_UPDATES_DIR)
        )

    @locked_mutation(ttl_ms=LONG_LEASE_TTL_MS)
    def consolidate_updates(self, **kw: Any) -> None:
        """Compact BOTH layers: fold the vector index's updates log into
        a new base snapshot (``Index.consolidate_updates``) and then fold
        the object-metadata updates log — one call keeps the two layers'
        log debt in lockstep (the reference's ingestion consolidates the
        metadata array alongside the vectors,
        ``embeddings_ingestion.py:331-333``).  Refused on a
        time-traveled handle by the same rule as
        :meth:`consolidate_object_metadata`."""
        if self._open_ts is not None:
            raise ValueError(
                "consolidate_updates on a time-traveled handle (opened at "
                f"ts={self._open_ts}) would drop updates newer than the "
                "open timestamp; reopen the index at latest "
                "(timestamp=None) and consolidate there"
            )
        self.index.consolidate_updates(**kw)
        self.consolidate_object_metadata()

    @locked_mutation(ttl_ms=LONG_LEASE_TTL_MS)
    def consolidate_object_metadata(self) -> None:
        """Fold the metadata updates log into the base table (the
        copy-on-write compaction; one distributed rewrite, then the log
        is dropped).

        Refused on a time-traveled handle: :meth:`metadata` there is the
        log filtered to ``ts <= open_ts``, so folding it and dropping the
        log would silently destroy every batch NEWER than the open
        timestamp — and diverge from the vector index, whose
        ``consolidate_updates`` only clears batches through its
        consolidation ts.  Reopen at latest first.

        Crash-safe swap: write new → rename live aside as backup →
        rename new into place → drop backup → drop the log.  Every crash
        point leaves either the live table or the backup on disk;
        :meth:`metadata` falls back to the backup (log intact, so no
        batch is lost at any crash point).
        """
        if self._open_ts is not None:
            raise ValueError(
                "consolidate_object_metadata on a time-traveled handle "
                f"(opened at ts={self._open_ts}) would drop metadata "
                "updates newer than the open timestamp; reopen the index "
                "at latest (timestamp=None) and consolidate there"
            )
        fs = HadoopFS(self.spark, self.uri)
        self._recover_metadata_backup(fs)
        upath = posixpath.join(self.uri, METADATA_UPDATES_DIR)
        if not fs.exists(upath):
            return
        merged = self.metadata()
        if merged is None:
            return
        # capture the log files THIS fold consumes before writing: the
        # blanket dir delete destroyed any batch a concurrent writer
        # appended during the fold (its vectors survived — the vector
        # side clears per-batch — so the two layers diverged silently).
        # The write may re-list and fold a late-arriving file too; that
        # file then survives in the log and re-applies idempotently
        # (latest-per-id over a base already carrying its values).
        upd_files = [
            f for f in merged.inputFiles() if METADATA_UPDATES_DIR in f
        ]
        folded_hi = (
            self.spark.read.parquet(upath).agg(F.max("ts")).first()[0]
        )
        tmp = posixpath.join(self.uri, "object_metadata__new")
        live = posixpath.join(self.uri, "object_metadata")
        backup = posixpath.join(self.uri, "object_metadata__backup")
        merged.write.mode("overwrite").parquet(tmp)
        fs.rename(live, backup)
        fs.rename(tmp, live)
        fs.delete(backup)
        for f in upd_files:
            fs.delete(f)
        if not any(
            n.endswith(".parquet") for n in fs.listdir(upath)
        ):
            fs.delete(upath)
        if folded_hi is not None:
            # record how far history was folded: a time-traveled handle
            # opened BEFORE this point can no longer reconstruct its
            # metadata view (the log rows are gone) — metadata() raises
            # instead of silently returning newer values
            marker = posixpath.join(self.uri, "_object_metadata_meta.json")
            prev = 0
            if fs.exists(marker):
                prev = int(
                    json.loads(fs.read_text(marker)).get("folded_through", 0)
                )
            fs.write_text_atomic(
                marker,
                json.dumps({"folded_through": max(prev, int(folded_hi))}),
            )

    def _recover_metadata_backup(self, fs: "HadoopFS") -> str | None:
        """If a crashed consolidation left only the backup table, promote
        it back to live; returns the resolved live path (None if no
        metadata table at all)."""
        live = posixpath.join(self.uri, "object_metadata")
        backup = posixpath.join(self.uri, "object_metadata__backup")
        if fs.exists(live):
            # a crash AFTER the new table landed but before cleanup
            # leaves a stale backup — drop it so it can't shadow later
            if fs.exists(backup):
                fs.delete(backup)
            return live
        if fs.exists(backup):
            fs.rename(backup, live)
            return live
        return None

    # -- query -----------------------------------------------------------------

    def _embed_queries(self, query_objects) -> DataFrame:
        """Embed query payloads driver-side (queries are small by contract —
        same asymmetry as the reference, ``object_index.py:433-449``)."""
        if isinstance(query_objects, DataFrame):
            pdf = query_objects.toPandas()
        else:
            pdf = pd.DataFrame(query_objects)
        if QUERY_ID_COL not in pdf.columns:
            pdf[QUERY_ID_COL] = range(len(pdf))
        self.embedding.load()
        mat = self.embedding.embed(pdf[self.reader.payload_columns()])
        rows = [
            (int(q), [float(x) for x in mat[i]])
            for i, q in enumerate(pdf[QUERY_ID_COL])
        ]
        return small_df(
            self.spark, rows, f"{QUERY_ID_COL} long, {VECTOR_COL} array<float>"
        )

    def query(
        self,
        query_objects,
        k: int,
        metadata_array_cond: str | None = None,
        metadata_df_filter_fn: Callable[[pd.DataFrame], Any] | None = None,
        return_objects: bool = False,
        return_metadata: bool = True,
        filter_pushdown: bool = False,
        recall_target: float | None = None,
        **query_kw: Any,
    ) -> DataFrame:
        """Embed → (over-fetched) kNN → metadata filter → top-k → attach.

        ``recall_target`` forwards to the backing index, which resolves
        the CHEAPEST measured operating point clearing the target from
        its persisted per-snapshot recall curve
        (``Index.measure_recall_curve``) — first-class here so object
        callers get the measured-recall contract without reaching into
        ``query_kwargs``.  Mutually exclusive with an explicit
        ``nprobe``/``k_factor``/``l_search`` (the index raises).  With
        ``filter_pushdown=True`` a recall_target takes precedence over
        pushdown's full-probe default (the curve point was measured
        unfiltered; under a very selective filter prefer the full-probe
        default or an explicit nprobe).

        ``metadata_array_cond`` is a SQL-WHERE-subset predicate over the
        metadata columns (reference TileDB query-condition grammar);
        ``metadata_df_filter_fn`` an arbitrary pandas row predicate.

        ``filter_pushdown=True`` evaluates the metadata predicate on the
        metadata table FIRST and restricts the index scan to the
        allowed ids (semi-join before scoring), instead of the reference's
        ``fetch_k = 50·k`` over-fetch (``object_index.py:451-453``),
        which silently returns fewer than k rows when the filter keeps
        less than ~1/50 of the neighborhood.  On FLAT this is exact
        top-k among the filtered set.  On IVF_FLAT/IVF_PQ it is exact
        WITHIN THE PROBED PARTITIONS: survivors of a very selective
        filter can live in unprobed partitions, so unless the caller
        passes ``nprobe`` explicitly, pushdown defaults to a FULL probe
        (nprobe = partitions) — the filter already pruned the scan, and
        exactness under a selective filter is the point of pushdown.
        Pass a smaller ``nprobe`` to trade that guarantee for speed.
        A graph walk (VAMANA) changes recall semantics under a
        pre-filter, so it keeps over-fetch.
        """
        if recall_target is not None:
            query_kw = {**query_kw, "recall_target": recall_target}
        md_table = self.metadata()  # ONE resolution per query call
        if self.embedding.multi_vector:
            # the fusion path has no filtered variant yet: refusing is
            # honest — the old early return silently IGNORED the filter
            # arguments and returned unfiltered rows
            if (
                metadata_array_cond is not None
                or metadata_df_filter_fn is not None
                or filter_pushdown
            ):
                raise NotImplementedError(
                    "metadata filtering is not supported for multi-vector "
                    "embeddings; query without filters and filter the "
                    "returned frame"
                )
            res = self._query_multi_vector(query_objects, k, **query_kw)
            if return_metadata and md_table is not None:
                res = res.join(md_table, ID_COL, "left")
            if return_objects:
                objs = self.reader.read_objects_by_external_ids(
                    self.spark, res.select(ID_COL).distinct()
                )
                dup = [
                    c for c in objs.columns if c != ID_COL and c in res.columns
                ]
                res = res.join(objs.drop(*dup), ID_COL, "left")
            return res
        queries = self._embed_queries(query_objects)
        filtering = (
            metadata_array_cond is not None or metadata_df_filter_fn is not None
        )
        if filtering and md_table is None:
            raise ValueError("no metadata table to filter on")
        if filter_pushdown:
            if not filtering:
                raise ValueError(
                    "filter_pushdown=True needs metadata_array_cond or "
                    "metadata_df_filter_fn"
                )
            if self.index.index_type not in ("FLAT", "IVF_FLAT", "IVF_PQ"):
                raise ValueError(
                    "filter_pushdown supports FLAT/IVF_FLAT/IVF_PQ backing "
                    f"indexes; {self.index.index_type} uses the over-fetch "
                    "path (pass filter_pushdown=False)"
                )
            md = md_table
            if metadata_array_cond is not None:
                md = md.where(F.expr(metadata_array_cond))
            if metadata_df_filter_fn is not None:
                md_schema = md.schema

                def _pre_filt(batches):
                    for pdf in batches:
                        yield pdf[metadata_df_filter_fn(pdf)]

                md = md.mapInPandas(_pre_filt, schema=md_schema)
            if (
                self.index.index_type in ("IVF_FLAT", "IVF_PQ")
                and "nprobe" not in query_kw
                and "recall_target" not in query_kw
            ):
                # default to full probe so the "exact among the filtered
                # set" contract holds even when the filter's survivors
                # cluster in partitions a sqrt(P) probe would skip
                query_kw = {**query_kw, "nprobe": self.index.partitions}
            res = self.index.query(
                queries, k, allowed_ids=md.select(ID_COL), **query_kw
            )
            if return_metadata:
                res = res.join(md_table, ID_COL, "left")
            if return_objects:
                objs = self.reader.read_objects_by_external_ids(
                    self.spark, res.select(ID_COL).distinct()
                )
                # metadata columns may already ride on res: keep the
                # attached copy, drop the reader's — a plain join
                # duplicated the names and every later reference raised
                # AMBIGUOUS_REFERENCE
                dup = [
                    c for c in objs.columns if c != ID_COL and c in res.columns
                ]
                res = res.join(objs.drop(*dup), ID_COL, "left")
            return res
        fetch_k = k
        if filtering:
            fetch_k = min(OVERFETCH_FACTOR * k, self.index.size())
        res = self.index.query(queries, fetch_k, **query_kw)

        if filtering:
            res = res.drop("rank")
            res = res.join(md_table, ID_COL, "left")
            if metadata_array_cond is not None:
                res = res.where(F.expr(metadata_array_cond))
            if metadata_df_filter_fn is not None:
                schema = res.schema

                def _filt(batches):
                    for pdf in batches:
                        yield pdf[metadata_df_filter_fn(pdf)]

                res = res.mapInPandas(_filt, schema=schema)
            asc = self.index.metric.ascending
            order = [
                F.col(DISTANCE_COL).asc() if asc else F.col(DISTANCE_COL).desc(),
                F.col(ID_COL).asc(),
            ]
            w = Window.partitionBy(QUERY_ID_COL).orderBy(*order)
            res = (
                res.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
            )
        elif return_metadata and md_table is not None:
            res = res.join(md_table, ID_COL, "left")

        if filtering and return_metadata:
            pass  # metadata already attached by the filter join
        elif filtering and not return_metadata:
            md_cols = [c for c in md_table.columns if c != ID_COL]
            res = res.drop(*md_cols)

        if return_objects:
            objs = self.reader.read_objects_by_external_ids(
                self.spark, res.select(ID_COL).distinct()
            )
            dup = [
                c for c in objs.columns if c != ID_COL and c in res.columns
            ]
            res = res.join(objs.drop(*dup), ID_COL, "left")
        return res

    def _query_multi_vector(self, query_objects, k: int, **query_kw: Any) -> DataFrame:
        """Multi-vector query: one kNN per query vector, then score fusion.

        Reference ``_merge_results_per_query`` (``object_index.py:561-635``):
        each query vector retrieves independently; per (query, object) the
        best pair score is kept (max), then summed over the query's vectors.
        Scores are -distance so "larger = better" matches the reference's
        similarity orientation.  Returns (query_id, external_id, score,
        rank ≤ k).
        """
        if isinstance(query_objects, DataFrame):
            pdf = query_objects.toPandas()
        else:
            pdf = pd.DataFrame(query_objects)
        if QUERY_ID_COL not in pdf.columns:
            pdf[QUERY_ID_COL] = range(len(pdf))
        self.embedding.load()
        mats = self.embedding.embed_multi(pdf[self.reader.payload_columns()])
        rows = []
        pair = 0
        pair_map = []  # pair id -> (query_id, emb_id)
        for qi, mat in zip(pdf[QUERY_ID_COL], mats):
            for ei in range(len(mat)):
                rows.append((pair, [float(x) for x in mat[ei]]))
                pair_map.append((pair, int(qi), ei))
                pair += 1
        qdf = small_df(
            self.spark, rows, f"{QUERY_ID_COL} long, {VECTOR_COL} array<float>"
        )
        res = self.index.query(qdf, k, **query_kw).drop("rank")
        pairs_df = small_df(
            self.spark, pair_map,
            f"{QUERY_ID_COL} long, __orig_query long, query_emb_id long",
        )
        scored = (
            res.join(F.broadcast(pairs_df), QUERY_ID_COL)
            .select(
                F.col("__orig_query").alias(QUERY_ID_COL),
                "query_emb_id",
                ID_COL,
                # similarity orientation: negate only DESCENDING-good
                # metrics; inner_product's raw score is already
                # larger-is-better, and negating it inverted rankings
                (
                    (-F.col(DISTANCE_COL))
                    if self.index.metric.ascending
                    else F.col(DISTANCE_COL)
                ).alias("score"),
            )
        )
        return fuse_multi_vector_scores(scored, k)


def create(
    spark: SparkSession,
    uri: str,
    index_type: str,
    object_reader: ObjectReader,
    embedding: ObjectEmbedding,
    **kwargs: Any,
) -> ObjectIndex:
    """Module-level creation shim for reference import parity
    (``object_api/object_index.py:914-923`` exports ``create(uri,
    index_type, object_reader, embedding, ...)`` alongside the class);
    a SparkSession replaces the reference's TileDB config mapping.
    Delegates to :meth:`ObjectIndex.create`."""
    return ObjectIndex.create(
        spark,
        uri,
        reader=object_reader,
        embedding=embedding,
        index_type=index_type,
        **kwargs,
    )
