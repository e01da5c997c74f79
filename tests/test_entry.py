"""THE local correctness gate: every queries() entry vs its DuckDB oracle.

Replicates the driver's per-round CORRECTNESS check (row count + schema +
order-insensitive values) at the test scale factor, so oracle drift is
caught in pytest rather than at a round boundary.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from tests.oracle_utils import assert_matches_duckdb

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "external_id", "distance", "rank"}


def test_oracle_coverage():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"
    # the non-SQL-expressible set is explicit and small (trained models)
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle == {
        "ivf_index_recall",
        "ivf_pq_index_recall",
        "vamana_index_recall",
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
