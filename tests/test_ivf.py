"""IVF ANN: exactness when probing every cell, recall when probing few,
determinism of the content-addressed seeding + Lloyd refinement."""

from __future__ import annotations

from pyspark.sql import functions as F

from thymeflow_back_spark.operators.ivf import (
    ivf_topk,
    refine_centroids,
    seed_centroids,
)
from thymeflow_back_spark.operators.similarity import cosine_topk
from thymeflow_back_spark.tables import load

SF = "/root/testdata/sf0.001"
K = 5
N_QUERIES = 10


def _pairs(df):
    return {(r.q_id, r.c_id) for r in df.collect()}


def test_ivf_full_probe_equals_exact(spark):
    emb = load(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", K)
    full = ivf_topk(
        emb, queries, "vec_id", "embedding", K, n_cells=8, n_probe=8, refine_iters=1
    )
    assert {(r.q_id, r.c_id, r.score) for r in full.collect()} == {
        (r.q_id, r.c_id, r.score) for r in exact.collect()
    }


def test_ivf_partial_probe_recall(spark):
    emb = load(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _pairs(cosine_topk(emb, queries, "vec_id", "embedding", K))
    approx = _pairs(
        ivf_topk(emb, queries, "vec_id", "embedding", K, n_cells=8, n_probe=4)
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"
    # probing fewer cells can only shrink the candidate set
    fewer = _pairs(ivf_topk(emb, queries, "vec_id", "embedding", K, n_cells=8, n_probe=1))
    assert len(exact & fewer) <= len(exact & approx) + 1


def test_ivf_deterministic(spark):
    emb = load(spark, SF, "embeddings")
    c1 = seed_centroids(emb, "vec_id", "embedding", 8)
    c2 = seed_centroids(emb, "vec_id", "embedding", 8)
    assert c1 == c2
    r1 = refine_centroids(emb, "vec_id", "embedding", c1, iterations=1)
    r2 = refine_centroids(emb, "vec_id", "embedding", c2, iterations=1)
    assert r1 == r2
    assert r1 != c1  # refinement moved the means


def test_ivf_partitioned_index_prunes_and_matches(spark, tmp_path):
    """The materialized cell-partitioned index returns the same top-k as the
    in-memory path, and the probe's scan carries a partition filter on cell
    (only the probed partitions are read — the 100 TB layout)."""
    import random

    from thymeflow_back_spark.operators.ivf import (
        ivf_probe_index,
        ivf_topk,
        ivf_write_index,
    )

    rnd = random.Random(3)
    corpus = spark.createDataFrame(
        [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.limit(5)
    path = str(tmp_path / "ivf_index")
    ivf_write_index(corpus, "vec_id", "embedding", path, n_cells=8, refine_iters=1)

    got = ivf_probe_index(
        spark, path, queries, "vec_id", "embedding", k=3, n_probe=2
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    expect = ivf_topk(
        corpus, queries, "vec_id", "embedding", k=3, n_cells=8, n_probe=2,
        refine_iters=1,
    )
    a = {(r.q_id, r.c_id, r.rank) for r in got.collect()}
    b = {(r.q_id, r.c_id, r.rank) for r in expect.collect()}
    assert a == b and len(a) == 15


def test_ivf_sq8_index_layout_and_recall(spark, tmp_path):
    from thymeflow_back_spark.operators.ivf import ivf_probe_index, ivf_write_index

    emb = load(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    raw_path = str(tmp_path / "ivf_raw")
    sq_path = str(tmp_path / "ivf_sq8")
    ivf_write_index(emb, "vec_id", "embedding", raw_path, n_cells=8)
    ivf_write_index(emb, "vec_id", "embedding", sq_path, n_cells=8, sq8=True)

    stored = spark.read.parquet(sq_path)
    assert "c_vec" not in stored.columns  # no float vectors on disk
    assert dict(stored.dtypes)["codes"] == "array<tinyint>"  # 1 byte/dim

    raw = _pairs(ivf_probe_index(spark, raw_path, queries, "vec_id", "embedding", K))
    quant = _pairs(ivf_probe_index(spark, sq_path, queries, "vec_id", "embedding", K))
    assert len(quant) == len(raw)
    overlap = len(raw & quant) / len(raw)
    assert overlap >= 0.8, f"SQ8 recall collapsed: {overlap}"
