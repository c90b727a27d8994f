"""Loop-scoped shuffle-partition sizing for iterative fixpoint operators.

The fixpoint loops (star-CC, min-label CC) run a handful of exchanges per
round over a loop-state relation whose size the driver KNOWS each round
(the convergence-signature count). The session's
``spark.sql.shuffle.partitions`` is sized to the core count — right for
corpus-sized scans, but inside a round it turns a few-thousand-row state
relation into cores-wide exchanges of ~100-row tasks: with AQE's
``coalescePartitions.parallelismFirst`` default (true) the coalescer
preserves parallelism rather than the advisory size, so the tiny tasks
never merge and every round pays ~6 stages × cores of task scheduling
(the round-11 instrumented ~1 s/round floor at sf0.1; guide §2.2 — many
tiny partitions are pure overhead).

Measured discipline (round 12, sf0.1): collapsing pays ONLY when the
state is small enough that a round is scheduling-dominated —

- star-CC over ~5k canonical edges: noop median 8.19 → 4.78 s (WIN);
- label propagation over a 76k-row edge relation: 3.12 → 3.79 s
  (REGRESSION — the vote join + window do real per-row work and lose
  core-level parallelism; reverted);
- min-label CC over a 2.3M-row symmetrized relation (q_primary_facet):
  noop ~14.6 → ~15.5 s (slight REGRESSION — min(string) aggregation is
  CPU-real at that size).

Hence :func:`fixpoint_partitions` only returns a scoped count when the
state is under ``SMALL_STATE_ROWS``; larger states keep the session
sizing (returns ``None`` → the scope is a no-op). Both constants are
env-parameterised because the break-even is cluster-dependent; the
scale-portable part is the FORMULA — the partition count derives from
the measured state size, never from the local core count, and on a
shrinking fixpoint the tail rounds collapse exactly when they become
scheduling-bound.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

# Below this many state rows a fixpoint round is scheduling-dominated
# (measured: a composed star round over 5k edges is ~0.2 s of execution
# vs ~1 s of tiny-stage scheduling at 32-wide); above it, per-row work is
# real and the session parallelism must stay.
SMALL_STATE_ROWS = int(os.environ.get("SPARK_GRAFT_LOOP_SMALL_ROWS", "50000"))
# Rows per reduce task once a state qualifies as small.
TARGET_ROWS_PER_TASK = int(
    os.environ.get("SPARK_GRAFT_LOOP_TARGET_ROWS", "50000")
)

_KEY = "spark.sql.shuffle.partitions"


def fixpoint_partitions(rows: int) -> int | None:
    """Scoped shuffle-partition count for a fixpoint round over ``rows``
    state rows, or ``None`` when the state is big enough that the session
    sizing should stay (see module docstring for the measurements)."""
    if rows > SMALL_STATE_ROWS:
        return None
    return max(1, math.ceil(rows / TARGET_ROWS_PER_TASK))


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int | None) -> Iterator[None]:
    """Set ``spark.sql.shuffle.partitions`` for the duration of the scope
    (no-op when ``n`` is None).

    The conf is read at physical-planning time, i.e. when an action runs
    inside the scope — lazily-built DataFrames executed AFTER the scope
    exits use the restored session value.
    """
    if n is None:
        yield
        return
    old = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(_KEY, old)
