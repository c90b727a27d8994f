"""Loop-scoped shuffle-partition sizing (operators/looptune.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators import looptune
from thymeflow_back_spark.operators.closure import (
    connected_components,
    connected_components_star,
)
from thymeflow_back_spark.operators.looptune import (
    fixpoint_partitions,
    scoped_shuffle_partitions,
)

_KEY = "spark.sql.shuffle.partitions"


def test_fixpoint_partitions_small_state():
    assert fixpoint_partitions(1) == 1
    assert fixpoint_partitions(looptune.TARGET_ROWS_PER_TASK) == 1
    assert (
        fixpoint_partitions(looptune.TARGET_ROWS_PER_TASK + 1) == 2
        or looptune.TARGET_ROWS_PER_TASK + 1 > looptune.SMALL_STATE_ROWS
    )


def test_fixpoint_partitions_big_state_keeps_session_sizing():
    assert fixpoint_partitions(looptune.SMALL_STATE_ROWS + 1) is None
    assert fixpoint_partitions(10_000_000) is None


def test_scope_sets_and_restores(spark):
    old = spark.conf.get(_KEY)
    with scoped_shuffle_partitions(spark, 3):
        assert spark.conf.get(_KEY) == "3"
    assert spark.conf.get(_KEY) == old


def test_scope_restores_on_exception(spark):
    old = spark.conf.get(_KEY)
    with pytest.raises(RuntimeError):
        with scoped_shuffle_partitions(spark, 2):
            raise RuntimeError("boom")
    assert spark.conf.get(_KEY) == old


def test_scope_none_is_noop(spark):
    old = spark.conf.get(_KEY)
    with scoped_shuffle_partitions(spark, None):
        assert spark.conf.get(_KEY) == old
    assert spark.conf.get(_KEY) == old


def test_cc_results_identical_under_scoping(spark):
    """The scoped loop (small graph -> 1-partition rounds) must produce
    exactly the min-label-propagation labeling — the star/propagation
    equivalence contract, exercised on a chain long enough for several
    rounds."""
    before = spark.conf.get(_KEY)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)] + [(100, 100), (200, 201)],
        "src bigint, dst bigint",
    )
    star = connected_components_star(edges)
    prop = connected_components(edges)
    assert star.exceptAll(prop).count() == 0
    assert prop.exceptAll(star).count() == 0
    # scoping restored the session conf after both loops
    assert spark.conf.get(_KEY) == before
