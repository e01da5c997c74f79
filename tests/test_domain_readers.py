"""Domain readers (§2.11 tail) + two-stage embeddings ingestion.

Mirrors the reference's ``tiledb_1d_array_reader.py`` / ``soma_reader.py``
/ ``bioimage_reader.py`` surfaces and the
``embeddings_ingestion.ingest_embeddings_with_driver`` two-stage DAG, with
the decode libraries stubbed (absent in this environment) and the Spark
plumbing real.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiledb_vector_search_spark.objects import (
    Array1DReader,
    BioImageDirectoryReader,
    DataFrameObjectReader,
    HashingTextEmbedding,
    IdentityEmbedding,
    ObjectIndex,
    SomaAnnDataReader,
    ingest_embeddings_with_driver,
)


# --- Array1DReader ------------------------------------------------------------


@pytest.fixture(scope="module")
def vec_parquet(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("arr1d") / "vecs")
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.col("vec_id").alias("external_id"),
            F.col("embedding").alias("vector"),
        )
        .write.parquet(path)
    )
    return path


def test_array1d_reader_slices_and_pushes_down(spark, vec_parquet):
    reader = Array1DReader(vec_parquet, start_offset=100, end_offset=200)
    df = reader.read_objects(spark)
    rows = df.collect()
    ids = sorted(r.external_id for r in rows)
    assert ids[0] >= 100 and ids[-1] < 200
    assert len(rows) == 100
    # the slice reaches the parquet scan as a pushed filter
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(external_id,100)" in plan


def test_array1d_identity_embedding_e2e(spark, vec_parquet, tmp_path):
    reader = Array1DReader(vec_parquet, end_offset=50)
    emb = IdentityEmbedding(dims=16)
    idx = ObjectIndex.create(
        spark, str(tmp_path / "oi"), reader, emb, index_type="FLAT", timestamp=10
    )
    base = spark.read.parquet(vec_parquet).where("external_id < 50").collect()
    target = next(r for r in base if r.external_id == 7)
    res = idx.query([{"vector": list(target.vector)}], k=1).collect()
    assert res[0].external_id == 7
    assert res[0].distance == pytest.approx(0.0, abs=1e-5)


# --- SomaAnnDataReader --------------------------------------------------------


def test_soma_reader_densifies_coo_with_obs(spark, tmp_path):
    rng = np.random.default_rng(7)
    n_cells, n_genes = 20, 12
    dense = np.zeros((n_cells, n_genes), dtype=np.float32)
    triples = []
    for c in range(n_cells):
        for g in rng.choice(n_genes, size=5, replace=False):
            v = float(rng.integers(1, 9))
            dense[c, g] = v
            triples.append((c, int(g), v))
    x_uri = str(tmp_path / "x_coo")
    obs_uri = str(tmp_path / "obs")
    spark.createDataFrame(
        triples, "cell_id long, gene_idx int, value float"
    ).write.parquet(x_uri)
    spark.createDataFrame(
        [(c, "B" if c % 2 else "T") for c in range(n_cells)],
        "cell_id long, cell_type string",
    ).write.parquet(obs_uri)

    reader = SomaAnnDataReader(
        x_uri, n_vars=n_genes, obs_uri=obs_uri, metadata_cols=["cell_type"]
    )
    rows = {r.external_id: r for r in reader.read_objects(spark).collect()}
    assert len(rows) == n_cells
    for c in range(n_cells):
        np.testing.assert_allclose(rows[c].vector, dense[c], rtol=1e-6)
        assert rows[c].cell_type == ("B" if c % 2 else "T")
    assert reader.payload_columns() == ["vector"]
    assert reader.metadata_attributes() == ["cell_type"]


def test_soma_reader_filtered_query_e2e(spark, tmp_path):
    # cells of one type cluster together; a filtered query must stay in-type
    n_genes = 8
    triples = []
    for c in range(30):
        base = 10.0 if c % 2 else 0.0
        for g in range(n_genes):
            triples.append((c, g, base + float((c * 7 + g) % 3) * 0.1))
    x_uri = str(tmp_path / "x")
    obs_uri = str(tmp_path / "obs")
    spark.createDataFrame(
        triples, "cell_id long, gene_idx int, value float"
    ).write.parquet(x_uri)
    spark.createDataFrame(
        [(c, "B" if c % 2 else "T") for c in range(30)],
        "cell_id long, cell_type string",
    ).write.parquet(obs_uri)
    reader = SomaAnnDataReader(
        x_uri, n_vars=n_genes, obs_uri=obs_uri, metadata_cols=["cell_type"]
    )
    idx = ObjectIndex.create(
        spark,
        str(tmp_path / "oi"),
        reader,
        IdentityEmbedding(dims=n_genes),
        index_type="FLAT",
        timestamp=5,
    )
    # query near the T-cluster (zeros) but restrict to B cells
    res = idx.query(
        [{"vector": [0.0] * n_genes}], k=3, metadata_array_cond="cell_type = 'B'"
    ).collect()
    assert len(res) == 3
    assert all(r.cell_type == "B" for r in res)
    assert all(r.external_id % 2 == 1 for r in res)


def test_soma_direct_open_is_stubbed():
    with pytest.raises(NotImplementedError, match="tiledbsoma"):
        SomaAnnDataReader.from_soma_experiment("soma://exp")


# --- BioImageDirectoryReader --------------------------------------------------


def test_bioimage_reader_levels_and_stub(spark, tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.tiff").write_bytes(b"II*\x00" + bytes(range(64)))
    (d / "b.tiff").write_bytes(b"II*\x00" + bytes(range(32)))
    (d / "skip.png").write_bytes(b"\x89PNG")
    reader = BioImageDirectoryReader(str(d), glob="*.tiff", levels=3)
    df = reader.read_objects(spark)
    rows = df.collect()
    assert set(df.columns) == {"external_id", "image", "file_path", "n_bytes", "level"}
    assert len(rows) == 2 * 3  # one row per (file, level)
    assert {r.level for r in rows} == {0, 1, 2}
    assert len({r.external_id for r in rows}) == 6  # ids unique across levels
    a_rows = [r for r in rows if r.file_path.endswith("a.tiff")]
    assert all(bytes(r.image)[:4] == b"II*\x00" for r in a_rows)
    with pytest.raises(NotImplementedError, match="bio-image"):
        BioImageDirectoryReader.decode_level(b"II*\x00", 0)
    with pytest.raises(ValueError):
        BioImageDirectoryReader(str(d), levels=0)


# --- two-stage embeddings ingestion ------------------------------------------


def test_ingest_embeddings_with_driver_stages_and_resume(spark, sf_dir, tmp_path):
    docs_path = str(tmp_path / "docs")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang")
        .limit(80)
        .write.parquet(docs_path)
    )
    reader = DataFrameObjectReader(
        path=docs_path,
        id_col="doc_id",
        payload_cols=["text"],
        metadata_cols=["lang"],
    )
    emb = HashingTextEmbedding(dims=32)
    uri = str(tmp_path / "oi_driver")
    idx = ingest_embeddings_with_driver(
        spark, uri, reader, emb, index_type="FLAT", timestamp=100
    )
    # stage-1 checkpoint exists and holds one vector per object
    staged = spark.read.parquet(f"{uri}/embeddings_staging")
    assert staged.count() == 80
    assert set(staged.columns) == {"external_id", "vector"}

    # same results as the fused single-job create
    q = [{"text": "hello world"}]
    uri2 = str(tmp_path / "oi_fused")
    idx2 = ObjectIndex.create(
        spark, uri2, reader, emb, index_type="FLAT", timestamp=100
    )
    r1 = [(r.external_id, r.distance) for r in idx.query(q, k=5).collect()]
    r2 = [(r.external_id, r.distance) for r in idx2.query(q, k=5).collect()]
    assert r1 == r2

    # resume=True reuses completed stage 1 even if the source is gone
    import shutil

    shutil.rmtree(docs_path)
    reader2 = DataFrameObjectReader(
        path=docs_path, id_col="doc_id", payload_cols=["text"]
    )
    idx3 = ingest_embeddings_with_driver(
        spark, uri, reader2, emb, index_type="FLAT", timestamp=200, resume=True
    )
    assert idx3.index.size() == 80


def test_ingest_embeddings_rejects_unknown_index_type(spark, tmp_path):
    with pytest.raises(ValueError, match="index_type"):
        ingest_embeddings_with_driver(
            spark,
            str(tmp_path / "x"),
            DataFrameObjectReader(path="/nonexistent", payload_cols=["text"]),
            HashingTextEmbedding(),
            index_type="NOPE",
        )


def test_binary_reader_ids_nonnegative(spark, tmp_path):
    # ids must stay in [0, 2^63): logical, not arithmetic, shift of xxhash64
    d = tmp_path / "many"
    d.mkdir()
    for i in range(32):
        (d / f"f{i}.tiff").write_bytes(b"II*\x00" + bytes([i]))
    rows = (
        BioImageDirectoryReader(str(d), levels=2).read_objects(spark).collect()
    )
    assert len(rows) == 64
    assert all(r.external_id >= 0 for r in rows)
