"""Distributed EXACT heavy hitters: Misra-Gries candidates + exact recount.

"Which tokens / URLs / n-grams exceed phi = 1/k of a 100 TB stream" is the
corpus-analysis primitive behind stop-lists, boilerplate detection, and
hot-key discovery — and the naive answer (groupBy token, filter by count)
shuffles the ENTIRE distinct vocabulary, which for n-gram or URL domains is
within an order of magnitude of the corpus itself. The classic two-pass
fix (Misra & Gries 1982; merge step per Agarwal et al., "Mergeable
Summaries", PODS 2012):

  pass 1  each input partition maintains k frequency counters (O(k) memory,
          no shuffle); when a batch overflows the budget, every counter is
          decremented by the (k+1)-th largest value and non-positive
          counters are dropped. Per-partition undercount <= N_p/(k+1), so
          any item with GLOBAL count > N/k survives in at least one
          partition (if it were evicted everywhere its total would be
          <= sum_p N_p/(k+1) = N/(k+1) < N/k). Survivors are the
          candidate set: at most k rows per partition. The same pass also
          emits one sentinel row carrying the partition's row count, so
          the stream total costs no extra scan.
  pass 2  exact recount of candidates only — the token stream inner-joins
          the BROADCAST candidate set (<= k x #partitions entries), so
          map-side partial aggregation shrinks each task's output to the
          candidate vocabulary before the one tiny shuffle.

The candidate set depends on partitioning and batch order, but the FINAL
output does not: pass 2's exact counts and the `cnt * k > N` filter make
the result a pure function of the data (the MG guarantee is that the
candidate set is a superset of the true heavy hitters, never that it is
canonical). That determinism is what lets a plain GROUP-BY/HAVING SQL
oracle hash-match the two-pass plan.

Pass 1 is a Python stage, but Arrow-batched (mapInPandas) with the
per-batch counting vectorized through pandas value_counts; the decrement
loop touches at most k + batch-distinct counters per batch. Its tiny
output (<= k+1 rows per partition) is persisted so the candidate and
total consumers never re-run the scan.

Input contract: the token column is non-null (NULL is reserved for the
sentinel rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cachereg import pin
from .skew import spread_small_input


def _mg_partition(col: str, k: int):
    """Per-partition Misra-Gries summary: surviving keys plus one
    NULL-keyed sentinel row carrying the partition row count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for tok, c in pdf[col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                # Mergeable-summaries reduction: subtract the (k+1)-th
                # largest count from everything, keep strict positives —
                # at most k survive, and the total undercount added per
                # reduction is bounded by what the dropped mass absorbed.
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - cut for t, c in counters.items() if c > cut}
        keys = sorted(counters)
        yield pd.DataFrame(
            {
                col: pd.Series(keys + [None], dtype=object),
                "__part_n": pd.Series([0] * len(keys) + [seen], dtype="int64"),
            }
        )

    return gen


def mg_summary(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Pass 1 output: (col, __part_n) — candidate keys (<= k per
    partition, __part_n = 0) plus one NULL-keyed sentinel per partition
    with its row count."""
    field = tokens.schema[col]
    return tokens.select(col).mapInPandas(
        _mg_partition(col, k),
        schema=f"{field.name} {field.dataType.simpleString()}, __part_n bigint",
    )


def mg_candidates(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """The per-partition Misra-Gries candidate keys (<= k each)."""
    return mg_summary(tokens, col, k).filter(F.col(col).isNotNull()).select(col)


def heavy_hitters(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """All items of `tokens[col]` with count > N/k: (col, cnt, share).

    Exact (not estimated) counts and exact recall — see module docstring.
    Two scans of the token stream (MG summary, recount), zero
    vocabulary-sized shuffles.
    """
    tokens = spread_small_input(tokens.select(col))
    # the summary is <= (k+1) x #partitions rows; persist so the candidate
    # and total consumers read one materialized pass over the stream
    summary = pin(mg_summary(tokens, col, k))
    cands = summary.filter(F.col(col).isNotNull()).select(col).distinct()
    total = summary.agg(F.sum("__part_n").alias("__n"))
    counts = (
        tokens.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("__n"))
        .select(
            col,
            "cnt",
            (F.col("cnt").cast("double") / F.col("__n")).alias("share"),
        )
    )


def _mg_grouped_partition(group_col: str, col: str, k: int):
    """Per-(partition, group) Misra-Gries summaries + per-group sentinel
    row counts. Memory O(k x groups-per-partition)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, dict[str, int]] = {}
        seen: dict[str, int] = {}
        for pdf in batches:
            for (g, tok), c in pdf.groupby([group_col, col]).size().items():
                d = counters.setdefault(g, {})
                d[tok] = d.get(tok, 0) + int(c)
                seen[g] = seen.get(g, 0) + int(c)
            for g, d in counters.items():
                if len(d) > k:
                    cut = sorted(d.values(), reverse=True)[k]
                    counters[g] = {t: c - cut for t, c in d.items() if c > cut}
        gs, toks, ns = [], [], []
        for g in sorted(counters):
            for t in sorted(counters[g]):
                gs.append(g)
                toks.append(t)
                ns.append(0)
        for g in sorted(seen):
            gs.append(g)
            toks.append(None)
            ns.append(seen[g])
        yield pd.DataFrame(
            {
                group_col: pd.Series(gs, dtype=object),
                col: pd.Series(toks, dtype=object),
                "__part_n": pd.Series(ns, dtype="int64"),
            }
        )

    return gen


def grouped_heavy_hitters(
    df: DataFrame, group_col: str, col: str, k: int
) -> DataFrame:
    """Per-group exact heavy hitters: (group, col, cnt, share) for items
    with count > N_group/k — "which tokens dominate WITHIN each language /
    domain / source", the per-stratum boilerplate detector.

    The Misra-Gries theorem holds group-wise (each group's counters see
    only that group's stream), so recall stays exact per group; the
    recount joins the broadcast (group, item) candidate set and the final
    threshold uses each group's own sentinel-summed total. Same two-scan
    budget as :func:`heavy_hitters`, zero vocabulary-sized shuffles.
    Contract: group and item columns are non-null (pandas groupby and the
    recount join are both null-dropping — coalesce NULL groups first)."""
    tokens = spread_small_input(df.select(group_col, col))
    field = tokens.schema[col]
    gfield = tokens.schema[group_col]
    summary = tokens.mapInPandas(
        _mg_grouped_partition(group_col, col, k),
        schema=(
            f"{gfield.name} {gfield.dataType.simpleString()}, "
            f"{field.name} {field.dataType.simpleString()}, __part_n bigint"
        ),
    )
    summary = pin(summary)
    cands = (
        summary.filter(F.col(col).isNotNull()).select(group_col, col).distinct()
    )
    totals = summary.groupBy(group_col).agg(F.sum("__part_n").alias("__n"))
    counts = (
        tokens.join(F.broadcast(cands), [group_col, col])
        .groupBy(group_col, col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.join(F.broadcast(totals), group_col)
        .filter(F.col("cnt") * F.lit(k) > F.col("__n"))
        .select(
            group_col,
            col,
            "cnt",
            (F.col("cnt").cast("double") / F.col("__n")).alias("share"),
        )
    )
