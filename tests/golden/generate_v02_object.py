"""Add an OBJECT group to the spark-0.2 golden corpus.

Freezes the object-layer on-disk layout the build writes today —
pickled (reader, embedding) blob, `object_metadata` base table, and the
`object_metadata_updates` merge-on-read log introduced with
metadata-DML parity — with replayed filtered-query snapshots, so future
rounds cannot drop the ability to read an existing object group.

Run once from the repo root (artifacts are then frozen in git):

    PYTHONPATH=/root/repo python tests/golden/generate_v02_object.py
"""

from __future__ import annotations

import json
import os
import random
import shutil

GOLDEN_ROOT = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(GOLDEN_ROOT, "spark-0.2")
GROUP = os.path.join(CORPUS, "object_group")
DOCS = os.path.join(CORPUS, "object_docs.parquet")

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima mike november oscar papa").split()
LANGS = ["en", "de", "fr"]
N_DOCS, K = 40, 3


def golden_docs() -> list[tuple[int, str, str]]:
    rng = random.Random(20260814)
    return [
        (i, " ".join(rng.choice(WORDS) for _ in range(12)), LANGS[i % 3])
        for i in range(N_DOCS)
    ]


def main() -> None:
    from tiledb_vector_search_spark import get_spark
    from tiledb_vector_search_spark.objects import (
        DataFrameObjectReader,
        HashingTextEmbedding,
        ObjectIndex,
    )

    spark = get_spark(app_name="golden-gen-02-obj", shuffle_partitions=4,
                      master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(GROUP, ignore_errors=True)
    shutil.rmtree(DOCS, ignore_errors=True)

    docs = spark.createDataFrame(
        golden_docs(), "doc_id long, text string, lang string"
    )
    docs.coalesce(1).write.parquet(DOCS)

    reader = DataFrameObjectReader(
        path=DOCS, id_col="doc_id", payload_cols=["text"],
        metadata_cols=["lang"],
    )
    idx = ObjectIndex.create(
        spark, GROUP, reader, HashingTextEmbedding(dims=16),
        index_type="FLAT", timestamp=1000,
    )
    # DML leaves the object_metadata_updates log in the frozen layout
    upd = spark.createDataFrame(
        [(1000, "brand new golden document text", "de")],
        "external_id long, text string, lang string",
    )
    idx.update_objects(upd, timestamp=2000)
    idx.delete_objects([3], timestamp=2500)

    idx = ObjectIndex(spark, GROUP)
    md = sorted(
        (int(r.external_id), r.lang) for r in idx.metadata().collect()
    )
    qtexts = [t for (_i, t, _l) in golden_docs()[:2]] + [
        "brand new golden document text"
    ]
    import pandas as pd

    q = pd.DataFrame({"query_id": range(len(qtexts)), "text": qtexts})
    results = {}
    for name, push in (("overfetch", False), ("pushdown", True)):
        rows = (
            idx.query(
                q, K, metadata_array_cond="lang = 'de'",
                filter_pushdown=push, strategy="expr",
            )
            .orderBy("query_id", "rank")
            .collect()
        )
        results[name] = [
            [int(r.query_id), int(r.rank), int(r.external_id),
             round(float(r.distance), 6), r.lang]
            for r in rows
        ]

    with open(os.path.join(CORPUS, "expected_object.json"), "w") as f:
        json.dump(
            {"k": K, "query_texts": qtexts, "metadata": md,
             "results": results},
            f, indent=2, sort_keys=True,
        )

    for root, _dirs, files in os.walk(CORPUS):
        for fn in files:
            if fn.endswith(".crc"):
                os.unlink(os.path.join(root, fn))

    print(f"object group written to {GROUP}")
    spark.stop()


if __name__ == "__main__":
    main()
