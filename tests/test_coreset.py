"""kcenter_sample vs a NumPy brute-force greedy replica."""

from __future__ import annotations

import numpy as np
import pandas as pd

from thymeflow_back_spark.operators.coreset import kcenter_sample

K = 6


def _greedy_numpy(ids, vecs, k):
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    chosen = [0]  # smallest id seeds
    out = [(1, int(ids[0]), 0.0)]
    for r in range(2, k + 1):
        d2 = np.full(len(ids), np.inf)
        for c in chosen:
            # same expression shape as the engine: x.x - 2 x.c + c.c
            cand = (
                (vecs * vecs).sum(axis=1)
                - 2.0 * vecs @ vecs[c]
                + float(vecs[c] @ vecs[c])
            )
            d2 = np.minimum(d2, cand)
        d2 = np.round(d2, 9)
        d2[chosen] = -np.inf
        best = int(np.argmax(d2))  # argmax takes the FIRST max -> smallest id
        chosen.append(best)
        out.append((r, int(ids[best]), float(d2[best])))
    return out


def test_kcenter_matches_bruteforce_greedy(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [
        (r["rank"], r["vec_id"], r["dist"])
        for r in kcenter_sample(emb, "vec_id", "embedding", K).orderBy("rank").collect()
    ]
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    want = _greedy_numpy(ids, vecs, K)
    assert [(r, i) for r, i, _ in got] == [(r, i) for r, i, _ in want]
    # distances agree to the rounding grid and are non-increasing after rank 2
    for (_, _, dg), (_, _, dw) in zip(got, want):
        assert abs(dg - dw) < 2e-9
    dists = [d for _, _, d in got][1:]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_kcenter_handles_k_exceeding_rows(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(3)
    out = kcenter_sample(emb, "vec_id", "embedding", 10).collect()
    assert len(out) == 3  # stops when the pool is exhausted


def test_kcenter_parallel_batch1_equals_greedy(spark):
    from thymeflow_back_spark.operators.coreset import kcenter_parallel

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    par = kcenter_parallel(emb, "vec_id", "embedding", K, batch=1).orderBy("rnd").collect()
    greedy = kcenter_sample(emb, "vec_id", "embedding", K).orderBy("rank").collect()
    assert [(r["rnd"] + 1, r["vec_id"], r["dist"]) for r in par] == [
        (r["rank"], r["vec_id"], r["dist"]) for r in greedy
    ]


def test_kcenter_parallel_radius_close_to_greedy(spark):
    # fixture regression check (not a theorem): the oversampled batch
    # variant's coverage radius stays within 1.5x of exact greedy at the
    # same k on the test embeddings
    from thymeflow_back_spark.operators.coreset import (
        coverage_radius,
        kcenter_parallel,
        kcenter_sample,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas().set_index("vec_id")
    k = 9

    def centers(rows):
        return [
            [float(x) for x in pdf.loc[r["vec_id"], "embedding"]] for r in rows
        ]

    r_par = coverage_radius(
        emb, "vec_id", "embedding",
        centers(kcenter_parallel(emb, "vec_id", "embedding", k, batch=4).collect()),
    )
    r_greedy = coverage_radius(
        emb, "vec_id", "embedding",
        centers(kcenter_sample(emb, "vec_id", "embedding", k).collect()),
    )
    assert 0 < r_par <= 1.5 * r_greedy, (r_par, r_greedy)


def test_kcenter_parallel_stops_when_pool_exhausted(spark):
    from thymeflow_back_spark.operators.coreset import kcenter_parallel

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(5)
    out = kcenter_parallel(emb, "vec_id", "embedding", 12, batch=4).collect()
    assert len(out) == 5


def test_coverage_radius_empty_input_raises(spark):
    import pytest

    from thymeflow_back_spark.operators.coreset import coverage_radius

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(0)
    with pytest.raises(ValueError, match="empty input"):
        coverage_radius(emb, "vec_id", "embedding", [[0.0] * 16])


def test_kcenter_parallel_broadcast_equals_literal(spark):
    """The broadcast-relation center shipping must reproduce the literal
    form's picks exactly (same arithmetic column), with the plan showing a
    broadcast join instead of k*d plan literals."""
    from thymeflow_back_spark.operators.coreset import kcenter_parallel

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lit = kcenter_parallel(
        emb, "vec_id", "embedding", 10, batch=3, centers_mode="literal"
    ).collect()
    bc = kcenter_parallel(
        emb, "vec_id", "embedding", 10, batch=3, centers_mode="broadcast"
    ).collect()
    assert [tuple(r) for r in lit] == [tuple(r) for r in bc]

    # plan shape: the broadcast form is a one-row broadcast join with NO
    # k*d literal array; the literal form embeds the doubles in the plan
    from pyspark.sql import functions as F2

    from thymeflow_back_spark.operators.coreset import (
        _centers_min_dist,
        _min_dist_over,
    )

    centers = [[float(x) for x in r["v"]] for r in
               emb.selectExpr("embedding as v").limit(3).collect()]
    cdf = spark.createDataFrame([(centers,)], "centers array<array<double>>")
    vecs = emb.selectExpr("vec_id as id", "embedding as v")
    bcast_plan = (
        vecs.crossJoin(F2.broadcast(cdf))
        .select(_min_dist_over(F2.col("v"), F2.col("centers")).alias("m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in bcast_plan
    lit_plan = (
        vecs.select(_centers_min_dist(F2.col("v"), centers).alias("m"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in lit_plan


def test_kcenter_auto_crosses_over_to_broadcast(spark):
    import thymeflow_back_spark.operators.coreset as C

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    old = C.CENTER_LITERAL_MAX
    try:
        # force the crossover at 2 centers so round 2 uses broadcast
        C.CENTER_LITERAL_MAX = 2 * dim - 1
        out = C.kcenter_parallel(emb, "vec_id", "embedding", 7, batch=2)
        want = C.kcenter_parallel(
            emb, "vec_id", "embedding", 7, batch=2, centers_mode="literal"
        )
        assert [tuple(r) for r in out.collect()] == [tuple(r) for r in want.collect()]
    finally:
        C.CENTER_LITERAL_MAX = old
