from tiledb_vector_search_spark.streaming.bm25_ingest import stream_bm25_ingest
from tiledb_vector_search_spark.streaming.bm25_search import stream_bm25_search
from tiledb_vector_search_spark.streaming.crawl_loop import stream_crawl_loop
from tiledb_vector_search_spark.streaming.dedup import dedup_stream
from tiledb_vector_search_spark.streaming.embedding_screen import (
    embedding_screen_batch,
    stream_embedding_screen,
)
from tiledb_vector_search_spark.streaming.dedup_against import (
    stream_dedup_against,
)
from tiledb_vector_search_spark.streaming.index_changes import (
    register_index_changes,
)
from tiledb_vector_search_spark.streaming.minhash_ingest import (
    stream_minhash_ingest,
)
from tiledb_vector_search_spark.streaming.search import stream_search_index
from tiledb_vector_search_spark.streaming.sessionize import sessionize_stream
from tiledb_vector_search_spark.streaming.updates import (
    hourly_rollup_stream,
    stream_updates_to_index,
)

__all__ = [
    "stream_updates_to_index",
    "stream_search_index",
    "hourly_rollup_stream",
    "sessionize_stream",
    "dedup_stream",
    "stream_dedup_against",
    "stream_bm25_ingest",
    "stream_bm25_search",
    "stream_minhash_ingest",
    "stream_crawl_loop",
    "stream_embedding_screen",
    "embedding_screen_batch",
    "register_index_changes",
]
