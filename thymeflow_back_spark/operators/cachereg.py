"""Session-scoped registry for operator-internal persisted relations.

Several operators persist load-bearing intermediates (the distributed
prefix sum's range-shuffled relation, Misra-Gries summaries, triangle
orientation tables, the curation-funnel stages): each intermediate feeds
two or more consumers, and without pinning Spark re-derives the whole
upstream subtree per consumer — or, for the prefix sum, re-draws
RangePartitioner boundaries and breaks correctness outright.

Those relations used to be bare ``.persist()`` calls with no release
path: the returned DataFrames are lazy, so a caller could never
unpersist them, and a long-lived session accumulated CacheManager
entries forever (LRU eviction bounds the MEMORY, but the entries and
plan objects stay pinned). This registry is the explicit release hook:

- ``pin(df)``    — persist + register; used by operators instead of a
  bare ``.persist()``.
- ``release_pinned()`` — unpersist everything registered. Harnesses
  call it BETWEEN queries (tools/check.py and bench.py do), after the
  previous query's results are fully materialized.

Contract: release only after every result derived from the pinned
relations has been collected. Unpersisting earlier is safe for queries
re-built from scratch, but re-COLLECTING a previously returned lazy
DataFrame after release would re-derive multi-consumer subtrees
independently — for the prefix sum that re-introduces the
nondeterministic-boundary hazard the persist exists to prevent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for ``release_pinned``."""
    out = df.persist()
    _PINNED.append(out)
    return out


def release_pinned() -> int:
    """Unpersist every registered relation; returns how many were freed."""
    n = len(_PINNED)
    for df in _PINNED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to free
    _PINNED.clear()
    return n


def pinned_count() -> int:
    return len(_PINNED)
