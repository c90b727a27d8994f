"""Lifecycle of the operator-internal pin registry (operators/cachereg.py).

The registry exists because operator persists used to be unreleasable
(ADVICE r5): callers only see lazy DataFrames, so CacheManager entries
accumulated for the life of the session. These tests pin the contract —
pin() persists and registers, release_pinned() frees everything exactly
once, and a released registry leaves none of ITS OWN RDDs cached.

Cache-state assertions compare RDD-id SETS, not counts: unpersist() is
asynchronous, so entries left by earlier tests can vanish mid-test and an
absolute count is a load-dependent flake (observed once under a busy
machine). What the contract guarantees is that release removes every id
pinned since the baseline — stale ids disappearing on their own is fine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thymeflow_back_spark.operators.cachereg import (
    pin,
    pinned_count,
    release_pinned,
)


def _cached_rdd_ids(spark) -> set[int]:
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().keysIterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_pin_release_roundtrip(spark):
    release_pinned()  # start clean regardless of fixture ordering
    base = _cached_rdd_ids(spark)
    df = pin(spark.range(100).withColumn("v", F.col("id") * 2))
    assert pinned_count() >= 1
    assert df.count() == 100
    assert len(_cached_rdd_ids(spark) - base) == 1
    freed = release_pinned()
    assert freed >= 1 and pinned_count() == 0
    assert not (_cached_rdd_ids(spark) - base)


def test_operator_pins_are_released_by_harness_hook(spark):
    """mad_outlier_stats pins two intermediates; after materializing the
    result and calling the release hook, none of its pins stay cached."""
    from thymeflow_back_spark.operators.robust import mad_outlier_stats

    release_pinned()
    base = _cached_rdd_ids(spark)
    df = spark.createDataFrame(
        [(g, float(i), f"{g}{i}") for g in ("a", "b") for i in range(7)],
        "g string, v double, id string",
    )
    out = mad_outlier_stats(df, "g", "v", "id").collect()
    assert len(out) == 2
    assert pinned_count() >= 2
    release_pinned()
    assert not (_cached_rdd_ids(spark) - base)


def test_release_tolerates_double_release(spark):
    pin(spark.range(10))
    release_pinned()
    assert release_pinned() == 0
