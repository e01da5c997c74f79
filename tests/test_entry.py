"""THE local correctness gate: every queries() entry vs its DuckDB oracle.

Replicates the driver's per-round CORRECTNESS check (row count + schema +
order-insensitive values) at the test scale factor, so oracle drift is
caught in pytest rather than at a round boundary.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from tiledb_vector_search_spark.queries import (
    DRIVER_WINDOW,
    FULL_ORACLE_SQL,
    FULL_REGISTRY,
)

from tests.oracle_utils import assert_matches_duckdb

# pytest sweeps the FULL registry (driver-visible + demoted twins) so
# demotion out of the driver's 50-entry window never loses coverage.
QUERIES = FULL_REGISTRY
ORACLES = FULL_ORACLE_SQL


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "external_id", "distance", "rank"}


def test_driver_window_curated():
    """The driver verifies only the first 50 queries() entries; keep the
    exported set exactly at the cap with an oracle for every entry."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) == DRIVER_WINDOW
    assert set(o) == set(q), f"driver entries without oracle: {set(q) - set(o)}"
    flagships = {
        "flat_index_lifecycle",
        "pii_detect_redact",
        "decontaminate_ngram_overlap",
        "object_filtered_search",
        "multimodal_binary_meta",
        "multimodal_frame_sample",
        # doc_similarity_topk demoted to the pytest twin (exact n-gram
        # jaccard stays gated via dedup_ngram_jaccard) when the semantic
        # crawl screen took its slot
        "embedding_screen_accepts",
        # ivf_index_recall_gate demoted to the pytest twin in r10 when
        # ivf_recall_target_search took its slot (same real IVF build,
        # but the headline measured-curve feature under a value-hash
        # oracle instead of a boolean gate)
        "ivf_recall_target_search",
        "ivf_pq_index_recall_gate",
        "vamana_index_recall_gate",
        "dedup_minhash_lsh",
        "corpus_clean_pipeline",
        # r11 optimization round: the mid-build window swap (hot-cell
        # split + range-open promotions) was never driver-verified, so
        # the window is pinned back to CORRECTNESS_r10's exact 50 keys;
        # ivf_split_rebalanced_search / range_open_changed_vectors keep
        # their identical oracle gates in the pytest sweep
        "customers_with_events",
        "text_repetition_scores",
    }
    assert flagships <= set(q), f"flagships outside window: {flagships - set(q)}"


def test_oracle_coverage():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"
    # the non-SQL-expressible set is explicit and small (trained models +
    # DCT/FFT perceptual hashes); all are pytest-only with their own
    # gates — the index recalls via the *_gate driver entries, the
    # perceptual pair sets via the planted-copy gates below
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle == {
        "ivf_index_recall",
        "ivf_pq_index_recall",
        "vamana_index_recall",
        "image_phash_neardup",
        "audio_fingerprint_neardup",
    }


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_duckdb(df, ORACLES[name], sf_dir, name=name)


def test_ivf_index_recall_gate(spark, sf_dir):
    rows = QUERIES["ivf_index_recall"](spark, sf_dir).collect()
    assert len(rows) == 10
    avg = sum(r.recall for r in rows) / len(rows)
    assert avg >= 0.85, f"avg recall {avg}"


def test_image_phash_neardup_gate(spark, sf_dir):
    """Every planted +1-pixel copy pairs with its original within the
    operator's radius; the result is a valid pair set over the
    synthesized corpus.  The planted distance is usually 0-1 but a +1
    pixel CAN flip several near-zero DCT sign bits (two hamming-2 pairs
    at sf0.01), so the gate asserts the pairing contract (found, and
    within max_hamming), not a data-dependent exact distance."""
    rows = QUERIES["image_phash_neardup"](spark, sf_dir).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    planted = [(i, i + 100000) for i in range(0, 150, 5)]
    hit = [p for p in planted if p in pairs]
    assert len(hit) == len(planted), (len(hit), len(planted))
    assert all(pairs[p] <= 4 for p in hit)
    assert sum(1 for p in hit if pairs[p] <= 1) >= 0.8 * len(planted)
    assert all(r.hamming <= 4 for r in rows)


def test_audio_fingerprint_neardup_gate(spark, sf_dir):
    """Every planted half-gain copy pairs with its original at hamming 0
    (gain invariance of the log-energy-difference bits)."""
    rows = QUERIES["audio_fingerprint_neardup"](spark, sf_dir).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    planted = [(i, i + 100000) for i in range(0, 150, 5)]
    hit = [p for p in planted if p in pairs]
    assert len(hit) == len(planted), (len(hit), len(planted))
    assert all(pairs[p] == 0 for p in hit)
