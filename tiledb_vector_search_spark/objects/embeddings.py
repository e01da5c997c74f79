"""Object embeddings: per-executor-loaded Arrow-batched embedding kernels.

Reference ABC: ``embeddings/object_embedding.py:8-60`` — ``load()`` once per
worker, then ``embed(objects, metadata) -> np.ndarray``.  Model impls
(SentenceTransformers, HF image, ColPali multi-vector, …) are heavyweight
deps not present here; the ABC contract plus deterministic toy embeddings
keep the Spark plumbing real and testable.  A real model drops in by
implementing ``load``/``embed`` — cloudpickle ships the instance to
executors exactly like the reference ships source code
(``object_index.py:884-911``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiledb_vector_search_spark.schemas import ID_COL, VECTOR_COL


class ObjectEmbedding(ABC):
    """Maps a batch of objects to vectors (reference ``ObjectEmbedding``)."""

    #: True for embeddings that emit MULTIPLE vectors per object (the
    #: reference's ColPali path, ``embeddings/colpali_embedding.py``); such
    #: classes implement :meth:`embed_multi` and queries fuse scores per
    #: (query, object) — see ``ObjectIndex.query`` / ``_merge_results_per_query``
    multi_vector = False

    @abstractmethod
    def dimensions(self) -> int:
        """Embedding dimensionality."""

    def load(self) -> None:
        """Load model state — called once per executor python worker before
        the first ``embed`` (reference ``object_embedding.py:37-43``)."""

    @abstractmethod
    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        """(n, dimensions) float32 embedding of a payload batch."""

    def embed_multi(self, objects: pd.DataFrame) -> list[np.ndarray]:
        """One (m_i, dimensions) matrix per object row (multi-vector
        embeddings only)."""
        raise NotImplementedError

    # -- Spark plumbing --------------------------------------------------------

    def transform(self, objects: DataFrame, payload_cols: list[str]) -> DataFrame:
        """(external_id, vector) for every object — an iterator-of-batches
        ``mapInPandas`` so ``load()`` runs once per worker, not per batch."""
        emb = self

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            emb.load()
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = emb.embed(pdf[payload_cols])
                yield pd.DataFrame(
                    {
                        ID_COL: pdf[ID_COL].to_numpy(dtype=np.int64),
                        VECTOR_COL: list(mat.astype(np.float32)),
                    }
                )

        return objects.select(ID_COL, *payload_cols).mapInPandas(
            run, schema=f"{ID_COL} long, {VECTOR_COL} array<float>"
        )


class SentenceTransformersEmbedding(ObjectEmbedding):
    """REAL text-embedding model via sentence-transformers (optional dep).

    Mirrors the reference ``SentenceTransformersEmbedding``
    (``embeddings/sentence_transformers_embedding.py``): the model name is
    cloudpickled to executors, the heavyweight model object is NOT — it is
    constructed lazily in :meth:`load`, which the ``transform`` iterator
    contract calls exactly once per executor python worker before the
    first batch.  When sentence-transformers is not installed (this
    environment), :meth:`load` raises ImportError with the install hint;
    the deterministic :class:`HashingTextEmbedding` is the drop-in
    stand-in.
    """

    def __init__(
        self,
        model_name_or_path: str = "all-MiniLM-L6-v2",
        dimensions: int = 384,
        text_col: str = "text",
    ):
        self.model_name_or_path = model_name_or_path
        self._dims = int(dimensions)
        self.text_col = text_col
        self._model = None  # never pickled with weights; see __getstate__

    def dimensions(self) -> int:
        return self._dims

    def load(self) -> None:
        if self._model is not None:
            return
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "SentenceTransformersEmbedding requires the optional "
                "'sentence-transformers' package (pip install "
                "sentence-transformers); use HashingTextEmbedding as a "
                "deterministic offline stand-in"
            ) from exc
        self._model = SentenceTransformer(self.model_name_or_path)

    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        if self._model is None:
            # direct-call path (no transform()): honor the load-once contract
            self.load()
        out = self._model.encode(
            [str(t) for t in objects[self.text_col]],
            convert_to_numpy=True,
            normalize_embeddings=False,
        )
        return np.asarray(out, dtype=np.float32)

    def __getstate__(self):
        # ship config only — executors re-load() the model locally, exactly
        # like the reference re-instantiates from serialized init kwargs
        state = self.__dict__.copy()
        state["_model"] = None
        return state


class LangChainEmbedding(ObjectEmbedding):
    """Adapter for any LangChain embeddings class (optional dep).

    Mirrors the reference ``LangChainEmbedding``
    (``embeddings/langchain_embedding.py``): the embedding CLASS NAME and
    its kwargs are pickled, the live client object is not — :meth:`load`
    resolves the class lazily per executor worker, trying
    ``langchain_openai`` first and ``langchain.embeddings`` second
    (the reference's module order), and the batch embeds through the
    LangChain ``embed_documents`` contract.  When neither module is
    installed, :meth:`load` raises ImportError with the install hint.
    """

    def __init__(
        self,
        dimensions: int,
        embedding_class: str = "OpenAIEmbeddings",
        embedding_kwargs: dict | None = None,
        text_col: str = "text",
    ):
        self._dims = int(dimensions)
        self.embedding_class = embedding_class
        self.embedding_kwargs = dict(embedding_kwargs or {})
        self.text_col = text_col
        self._client = None

    def dimensions(self) -> int:
        return self._dims

    def load(self) -> None:
        if self._client is not None:
            return
        import importlib

        last: Exception | None = None
        for module in ("langchain_openai", "langchain.embeddings"):
            try:
                mod = importlib.import_module(module)
            except ImportError as exc:
                last = exc
                continue
            cls = getattr(mod, self.embedding_class, None)
            if cls is not None:
                self._client = cls(**self.embedding_kwargs)
                return
            last = AttributeError(
                f"{module} has no class {self.embedding_class!r}"
            )
        raise ImportError(
            "LangChainEmbedding requires the optional 'langchain-openai' "
            "or 'langchain' package exposing "
            f"{self.embedding_class!r}; use HashingTextEmbedding as a "
            "deterministic offline stand-in"
        ) from last

    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        if self._client is None:
            self.load()
        out = np.asarray(
            self._client.embed_documents(
                [str(t) for t in objects[self.text_col]]
            ),
            dtype=np.float32,
        )
        if out.ndim != 2 or out.shape[1] != self._dims:
            raise ValueError(
                f"{self.embedding_class} returned shape {out.shape}, "
                f"declared dimensions={self._dims}"
            )
        return out

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_client"] = None  # clients may hold sockets/keys — re-load()
        return state


class HuggingFaceAutoImageEmbedding(ObjectEmbedding):
    """CLS-token image embedding via transformers AutoModel (optional dep).

    Mirrors the reference ``HuggingFaceAutoImageEmbedding``
    (``embeddings/huggingface_auto_image_embedding.py``): pickles only
    the model NAME; :meth:`load` builds ``AutoImageProcessor`` +
    ``AutoModel`` per worker; :meth:`embed` consumes decoded pixel rows
    (a flat ``image`` array + its ``shape``, the reference's object
    layout), batches them through the processor, and takes the
    last-hidden-state CLS token.  transformers/PIL are absent in this
    environment — the ImportError names the deterministic
    :class:`LumaGridEmbedding` as the offline stand-in, and the Spark
    plumbing (pickle round-trip, per-worker load, batch shapes) is
    tested with a fake transformers module.
    """

    def __init__(
        self,
        model_name_or_path: str,
        dimensions: int,
        batch_size: int = 64,
        image_col: str = "image",
        shape_col: str = "shape",
    ):
        self.model_name_or_path = model_name_or_path
        self._dims = int(dimensions)
        self.batch_size = int(batch_size)
        self.image_col = image_col
        self.shape_col = shape_col
        self._processor = None
        self._model = None

    def dimensions(self) -> int:
        return self._dims

    def load(self) -> None:
        if self._model is not None:
            return
        try:
            from transformers import AutoImageProcessor, AutoModel  # type: ignore
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "HuggingFaceAutoImageEmbedding requires the optional "
                "'transformers' package; use LumaGridEmbedding as a "
                "deterministic offline stand-in"
            ) from exc
        self._processor = AutoImageProcessor.from_pretrained(
            self.model_name_or_path
        )
        self._model = AutoModel.from_pretrained(self.model_name_or_path)

    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        if self._model is None:
            self.load()
        images = [
            np.asarray(img, dtype=np.uint8).reshape(list(shape))
            for img, shape in zip(
                objects[self.image_col], objects[self.shape_col]
            )
        ]
        out = np.zeros((len(images), self._dims), dtype=np.float32)
        for lo in range(0, len(images), self.batch_size):
            chunk = images[lo : lo + self.batch_size]
            inputs = self._processor(images=chunk, return_tensors="pt")
            hidden = self._model(**inputs).last_hidden_state
            out[lo : lo + len(chunk)] = (
                hidden[:, 0].detach().cpu().numpy().astype(np.float32)
            )
        return out

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_processor"] = None
        state["_model"] = None  # weights never ride the pickle
        return state


class HashingTextEmbedding(ObjectEmbedding):
    """Deterministic feature-hashing text embedding (no model weights).

    Tokens are hashed into ``dimensions`` buckets with a signed count
    (the classic hashing trick), then L2-normalized.  Deterministic across
    executors and runs — the test/oracle stand-in for SentenceTransformers.
    """

    def __init__(self, dims: int = 64, text_col: str = "text"):
        self._dims = dims
        self.text_col = text_col

    def dimensions(self) -> int:
        return self._dims

    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        import hashlib

        out = np.zeros((len(objects), self._dims), dtype=np.float64)
        for i, text in enumerate(objects[self.text_col]):
            for tok in str(text).lower().split():
                h = hashlib.md5(tok.encode()).digest()
                bucket = int.from_bytes(h[:4], "big") % self._dims
                sign = 1.0 if h[4] & 1 else -1.0
                out[i, bucket] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out.astype(np.float32)


class BytesHistogramEmbedding(ObjectEmbedding):
    """Deterministic byte-histogram features for opaque binary payloads.

    The stand-in for image/audio feature extractors (decode stubbed — see
    ``DirectoryImageReader.decode``): 256-bin byte histogram, L1-normalized.
    """

    def __init__(self, payload_col: str = "image"):
        self.payload_col = payload_col

    def dimensions(self) -> int:
        return 256

    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        out = np.zeros((len(objects), 256), dtype=np.float64)
        for i, blob in enumerate(objects[self.payload_col]):
            if blob is None:
                continue  # NULL payload -> zero-vector sentinel, the
                # same one-corrupt-blob-must-not-fail-the-task posture
                # as LumaGridEmbedding (bytes(None) raised TypeError and
                # aborted the whole ingest job)
            arr = np.frombuffer(bytes(blob), dtype=np.uint8)
            if arr.size:
                counts = np.bincount(arr, minlength=256)
                out[i] = counts / arr.size
        return out.astype(np.float32)


class LumaGridEmbedding(ObjectEmbedding):
    """REAL pixel-content image embedding: decode → luma → area-mean
    grid → L2-normalized vector.

    With the native codecs (netpbm, 8-bit PNG, baseline JPEG —
    ``objects/codecs.py``/``objects/jpeg.py``) the image object
    pipeline no longer needs a byte-level stand-in: this embedding sees
    PIXELS, so a re-encode of the same picture (different bytes, same
    content) lands next to the original in the index — the property
    the reference gets from its model-based extractors
    (``object_readers/directory_reader.py`` + PIL), at a
    deterministic/testable fidelity.
    """

    def __init__(self, payload_col: str = "image", grid: int = 8):
        self.payload_col = payload_col
        self.grid = int(grid)

    def dimensions(self) -> int:
        return self.grid * self.grid

    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        from tiledb_vector_search_spark.objects.codecs import decode_image

        g = self.grid
        out = np.zeros((len(objects), g * g), dtype=np.float64)
        for i, blob in enumerate(objects[self.payload_col]):
            # one corrupt blob must not fail the whole Spark task (and
            # job after retries) — crawled corpora WILL contain
            # undecodable images.  Emit the zero vector as the sentinel,
            # matching phash64/audio_fingerprint's NULL-on-bad-blob
            # posture.  Ranking: LumaGrid embeddings are NONNEGATIVE, so
            # under IP the sentinel's score (exactly 0) ties the worst
            # possible real score, and under L2/cosine it sits at a
            # fixed maximal distance (normalize_expr is zero-safe) — it
            # cannot outrank any genuinely similar row and only
            # surfaces when fewer than k real rows match at all.
            try:
                px = np.asarray(decode_image(bytes(blob)), dtype=np.float64)
            except Exception:
                continue
            if px.ndim == 3:
                if px.shape[2] >= 3:
                    # ×1000 integer Rec.601 weights keep the plane
                    # integer-exact for the integral-image sums; the
                    # scale cancels in the L2 normalization below
                    px = (
                        299.0 * px[:, :, 0]
                        + 587.0 * px[:, :, 1]
                        + 114.0 * px[:, :, 2]
                    )
                else:
                    px = px[:, :, 0]
            from tiledb_vector_search_spark.objects.codecs import (
                area_mean_grid,
            )

            cell = area_mean_grid(px, g)
            v = cell.ravel()
            n = np.linalg.norm(v)
            out[i] = v / n if n > 0 else v
        return out.astype(np.float32)


class HalvesTextEmbedding(HashingTextEmbedding):
    """Deterministic MULTI-VECTOR text embedding: one hashing-trick vector
    per half of the token stream — the test stand-in for ColPali-style
    per-patch/multi-vector models."""

    multi_vector = True

    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        # single-vector view: embed the whole text (used for object ingest
        # when the index stores one vector per object)
        return super().embed(objects)

    def embed_multi(self, objects: pd.DataFrame) -> list[np.ndarray]:
        out: list[np.ndarray] = []
        for text in objects[self.text_col]:
            toks = str(text).split()
            mid = max(1, len(toks) // 2)
            halves = pd.DataFrame(
                {self.text_col: [" ".join(toks[:mid]), " ".join(toks[mid:])]}
            )
            out.append(super().embed(halves))
        return out


class IdentityEmbedding(ObjectEmbedding):
    """Pass-through for sources whose payload already IS the vector.

    Pairs with ``Array1DReader`` / ``SomaAnnDataReader`` (pre-computed
    embeddings or expression matrices — the reference's 1-D array reader
    feeds such vectors straight to ingestion).  ``transform`` is pure
    Catalyst — no Python worker in the path.
    """

    def __init__(self, dims: int):
        self._dims = int(dims)

    def dimensions(self) -> int:
        return self._dims

    def transform(self, objects: DataFrame, payload_cols: list[str]) -> DataFrame:
        src = payload_cols[0] if payload_cols else VECTOR_COL
        return objects.select(
            ID_COL, F.col(src).cast("array<float>").alias(VECTOR_COL)
        )

    def embed(self, objects: pd.DataFrame) -> np.ndarray:
        col = objects.iloc[:, 0]
        return np.stack([np.asarray(v, dtype=np.float32) for v in col])


class RandomEmbedding(ObjectEmbedding):
    """Seeded random embedding keyed by external_id (reference
    ``embeddings/random_embedding.py``) — for pipeline tests."""

    def __init__(self, dims: int = 16, seed: int = 42):
        self._dims = dims
        self.seed = seed

    def dimensions(self) -> int:
        return self._dims

    def transform(self, objects: DataFrame, payload_cols: list[str]) -> DataFrame:
        dims, seed = self._dims, self.seed

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids = pdf[ID_COL].to_numpy(dtype=np.int64)
                mat = np.empty((len(ids), dims), dtype=np.float32)
                for i, eid in enumerate(ids):
                    mat[i] = np.random.default_rng(seed ^ int(eid)).standard_normal(dims)
                yield pd.DataFrame({ID_COL: ids, VECTOR_COL: list(mat)})

        return objects.select(ID_COL).mapInPandas(
            run, schema=f"{ID_COL} long, {VECTOR_COL} array<float>"
        )

    def embed(self, objects: pd.DataFrame) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError("RandomEmbedding embeds by id via transform")
