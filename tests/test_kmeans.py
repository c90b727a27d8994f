"""Exact-integer Lloyd k-means unit tests (operators/kmeans.py). The
catalog oracle replays the full trajectory cross-engine; these pin the
operator-level semantics on hand-built geometry."""

from __future__ import annotations

from thymeflow_back_spark.operators.kmeans import kmeans_cluster_stats, kmeans_fit


def _blobs(spark):
    # two tight, well-separated 3-d blobs, labels matching the blob
    rows = []
    for i in range(10):
        rows.append((i, [1.0 + 0.001 * i, 1.0, 1.0], 0))
    for i in range(10, 20):
        rows.append((i, [-1.0 - 0.001 * i, -1.0, -1.0], 1))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_two_blobs_separate_perfectly(spark):
    df = _blobs(spark)
    assign, cents = kmeans_fit(df, "vec_id", "embedding", k=2, iters=3)
    got = {r["vec_id"]: r["cell"] for r in assign.collect()}
    blob0 = {got[i] for i in range(10)}
    blob1 = {got[i] for i in range(10, 20)}
    assert len(blob0) == 1 and len(blob1) == 1 and blob0 != blob1
    # final centroid stats carry exact integer sums with n = 10 each
    assert sorted(n for _, n, _ in cents) == [10, 10]


def test_cluster_stats_majority_and_inertia(spark):
    df = _blobs(spark)
    out = {
        r["cluster"]: r.asDict()
        for r in kmeans_cluster_stats(
            df, "vec_id", "embedding", "label", k=2, iters=3
        ).collect()
    }
    assert sorted(v["size"] for v in out.values()) == [10, 10]
    assert {v["majority_label"] for v in out.values()} == {0, 1}
    assert all(v["majority_n"] == 10 for v in out.values())
    # blobs have spread only in dim 0 (0.001 steps): inertia is tiny but
    # nonzero, and certainly below the squared inter-blob distance
    assert all(0 <= v["inertia"] < 0.01 for v in out.values())


def test_empty_cluster_falls_back_to_seed(spark):
    # k = 3 over 2 distinct points duplicated: one seed can end up owning
    # nothing; the operator must keep its seed (n = 1) and not crash
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [-1.0, 0.0], 1),
            (4, [-1.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    assign, cents = kmeans_fit(df, "vec_id", "embedding", k=3, iters=2)
    assert assign.count() == 4
    assert len(cents) == 3
    assert all(n >= 1 for _, n, _ in cents)
