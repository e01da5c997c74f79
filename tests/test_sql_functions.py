"""SQL scalar UDF surface: parity with the DataFrame builders.

Every function in ``SQL_FUNCTIONS`` must produce EXACTLY the DataFrame
builder's output on the real documents corpus — this is what keeps the
hand-written lambda bodies (``SQL_BODY_OVERRIDES``) honest, and proves
the analyzer-rendered bodies round-tripped losslessly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.sql.functions import (
    SQL_BODY_OVERRIDES,
    SQL_FUNCTIONS,
    register_sql_functions,
)


@pytest.fixture(scope="module")
def registered(spark):
    return set(register_sql_functions(spark))


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    df.createOrReplaceTempView("sqlfn_docs")
    return df


@pytest.mark.parametrize("name", sorted(SQL_FUNCTIONS))
def test_sql_udf_matches_builder(spark, registered, docs, name):
    assert name in registered
    via_sql = spark.sql(
        f"SELECT doc_id, {name}(text) AS v FROM sqlfn_docs"
    )
    via_df = docs.select("doc_id", SQL_FUNCTIONS[name]("text").alias("v"))
    sql_rows = {r.doc_id: r.v for r in via_sql.collect()}
    df_rows = {r.doc_id: r.v for r in via_df.collect()}
    assert sql_rows == df_rows


def test_sql_udf_inlines_into_codegen(spark, registered, docs):
    """The SQL UDF is an inlined expression, not a Python UDF: the plan
    must contain no BatchEvalPython / ArrowEvalPython stage."""
    import io
    from contextlib import redirect_stdout

    q = spark.sql(
        "SELECT doc_id FROM sqlfn_docs "
        "WHERE pii_email_count(text) = 0 AND token_count(text) > 3"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan
    # formatted mode marks whole-stage-codegen membership per node
    assert "codegen id" in plan


def test_adversarial_inputs(spark, registered):
    """Empty / whitespace / punctuation-only / unicode strings agree
    between the SQL and DataFrame forms (edge behavior of the hand-written
    lambda bodies)."""
    rows = [
        (0, ""),
        (1, "   "),
        (2, "!!! ??? ..."),
        (3, "a"),
        (4, "a b a b a b"),
        (5, "Ünïcode tëxt — em–dash"),
        (6, "the " * 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("sqlfn_adv")
    for name in sorted(SQL_BODY_OVERRIDES):
        via_sql = {
            r.doc_id: r.v
            for r in spark.sql(
                f"SELECT doc_id, {name}(text) AS v FROM sqlfn_adv"
            ).collect()
        }
        via_df = {
            r.doc_id: r.v
            for r in df.select(
                "doc_id", SQL_FUNCTIONS[name]("text").alias("v")
            ).collect()
        }
        assert via_sql == via_df, name
