"""Operator-contract tests for the spatial pair join and BM25 ranking —
properties the catalog oracle can't isolate (exact-once pair emission
across cell boundaries, tie-breaks, term dedupe)."""

from __future__ import annotations

from thymeflow_back_spark.operators.fts import bm25_rank
from thymeflow_back_spark.operators.spatial import within_distance_pairs


def test_spatial_pairs_exact_once_across_cell_boundary(spark):
    # radius 100 m -> cell edge 200 m; ~0.0018 deg lat apart straddles a
    # boundary for many grid phases; pair must appear EXACTLY once
    pts = spark.createDataFrame(
        [
            (1, 48.10000, 2.0),
            (2, 48.10080, 2.0),   # ~88 m north of 1 (within radius)
            (3, 48.10500, 2.0),   # ~550 m north (outside radius)
            (4, 48.10000, 2.0),   # coincident with 1
        ],
        "pid bigint, lat double, lon double",
    )
    rows = within_distance_pairs(pts, "pid", "lat", "lon", 100.0, 48.1).collect()
    pairs = sorted((r.a_id, r.b_id) for r in rows)
    assert pairs == [(1, 2), (1, 4), (2, 4)]
    assert len(pairs) == len(set(pairs))  # exactly once each
    d = {(r.a_id, r.b_id): r.dist_m for r in rows}
    assert d[(1, 4)] == 0.0
    assert 80 < d[(1, 2)] < 100


def test_spatial_pairs_empty_when_far(spark):
    pts = spark.createDataFrame(
        [(1, 48.0, 2.0), (2, 48.5, 2.5)], "pid bigint, lat double, lon double"
    )
    assert within_distance_pairs(pts, "pid", "lat", "lon", 50.0, 48.25).count() == 0


def test_bm25_ranking_and_term_dedupe(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "filler filler filler filler filler"),
            (4, "spark"),
        ],
        "doc_id bigint, text string",
    )
    r1 = {r.doc_id: (r.score, r.rank) for r in
          bm25_rank(docs, "doc_id", "text", ["spark"], 10).collect()}
    # only docs containing the term score; tf=3 wins (k1=1.2 saturation
    # still rewards it over doc 4's shorter length), doc 2 trails both
    assert set(r1) == {1, 2, 4}
    assert r1[1][1] == 1 and r1[4][1] == 2 and r1[2][1] == 3
    assert r1[1][0] > r1[4][0] > r1[2][0]
    # repeated query terms must not double-count
    r2 = {r.doc_id: (r.score, r.rank) for r in
          bm25_rank(docs, "doc_id", "text", ["spark", "spark"], 10).collect()}
    assert r1 == r2


def test_bm25_k_cap_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(i, "tok filler") for i in range(10)], "doc_id bigint, text string"
    )
    rows = bm25_rank(docs, "doc_id", "text", ["tok"], 3).collect()
    # identical scores -> tie-break by ascending doc_id, capped at k
    assert [(r.doc_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)] == [
        (0, 1), (1, 2), (2, 3)
    ]


def test_zorder_known_codes(spark):
    """Morton interleave sanity on known values: z(0,0)=0, z(1,0)=1,
    z(0,1)=2, z(1,1)=3, z(2,2)=12 — and full-range corners."""
    from thymeflow_back_spark.operators.zorder import Z_MAX, with_zorder

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (Z_MAX, Z_MAX)],
        "x bigint, y bigint",
    )
    # min=0/max=Z_MAX makes the 16-bit scaling the identity
    rows = {(r.x, r.y): r.z for r in with_zorder(df, "x", "y").collect()}
    assert rows[(0, 0)] == 0
    assert rows[(1, 0)] == 1
    assert rows[(0, 1)] == 2
    assert rows[(1, 1)] == 3
    assert rows[(2, 2)] == 12
    assert rows[(Z_MAX, Z_MAX)] == (1 << 32) - 1


def test_zorder_buckets_are_tight_rectangles(spark):
    """The point of z-order: bucket-level spans shrink in BOTH dimensions.
    With 4096 grid points in 16 z-buckets, each bucket must cover at most
    ~a quarter of each dimension's range (a single-column sort would leave
    the other dimension's span at ~100%)."""
    import pyspark.sql.functions as F

    from thymeflow_back_spark.operators.zorder import with_zorder

    pts = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("bigint").alias("y")
    )
    z = with_zorder(pts, "x", "y")
    spans = (
        z.groupBy((F.col("z") / (1 << 28)).cast("bigint").alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(spans) == 16
    for r in spans:
        assert r.xs <= 16 and r.ys <= 16  # 16/63 ≈ quarter of the range


def test_spatial_pairs_matches_brute_force(spark):
    """Blocked join == brute-force all-pairs on a random cloud (fixed
    seed): completeness of the 9-cell replication and exactness of the
    haversine filter, including pairs that straddle cell boundaries."""
    import itertools
    import random

    rng = random.Random(42)
    pts = [
        (i, 48.0 + rng.random() * 0.01, 2.0 + rng.random() * 0.01)
        for i in range(80)
    ]
    df = spark.createDataFrame(pts, "pid bigint, lat double, lon double")
    from thymeflow_back_spark.operators.spatial import within_distance_pairs

    got = {
        (r.a_id, r.b_id)
        for r in within_distance_pairs(df, "pid", "lat", "lon", 150.0, 48.005).collect()
    }

    import math

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (p[1], p[2], q[1], q[2]))
        a = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371000.0 * math.asin(math.sqrt(a))

    want = {
        (p[0], q[0])
        for p, q in itertools.combinations(pts, 2)
        if round(hav(p, q), 3) <= 150.0
    }
    assert got == want and len(want) > 50
