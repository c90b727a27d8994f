"""Length-balanced bin assignment: straggler-free batch assembly.

Inference and tokenization jobs are bottlenecked by their largest shard;
assigning documents to k workers round-robin IN DESCENDING LENGTH ORDER
(the distributed form of the LPT/greedy multiprocessor-scheduling
heuristic: each of the k largest items lands on its own bin, then the next
k, …) keeps per-bin totals within one document of each other for smooth
length distributions — versus hash assignment whose imbalance is unbounded
by heavy-tailed document lengths.

Distributed shape: the global descending-length rank comes from the
deterministic distributed prefix sum (one range shuffle, never a
single-task sort); the bin id is then a pure projection ((rank-1) mod k)
and the per-bin summary one k-row aggregate. Everything is exact integer
arithmetic, reproducible on any engine or partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import distributed_prefix_sum


def balanced_bins(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    carry: tuple[str, ...] = (),
    seq_col: str | None = None,
) -> DataFrame:
    """Assign each row a bin in [0, k): (id, weight, *carry, bin[, seq]).

    Round-robin over the global (weight DESC, id ASC) rank. Deterministic:
    the rank is a pure function of the key set, so re-runs and different
    cluster layouts assign identical bins.

    ``weight_col`` may be any numeric type: the rank orders on the
    untruncated value (negated as double — exact for integers below 2^53
    and correct for fractional weights), and the output ``weight`` column
    carries the native input value, not a bigint truncation.

    ``carry`` columns pass through untouched (payload for a shard writer).
    ``seq_col`` additionally emits the 1-based position WITHIN the bin in
    descending-weight order — a pure projection of the global rank
    ((rank-1) div k + 1), costing nothing beyond the one range exchange.
    """
    ranked = distributed_prefix_sum(
        df.select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            *[F.col(c) for c in carry],
            (-F.col(weight_col).cast("double")).alias("__negw"),
        ),
        ["__negw", id_col],
        F.lit(1).cast("bigint"),
        out_col="__rank",
    )
    out = [
        F.col(id_col),
        F.col("weight"),
        *[F.col(c) for c in carry],
        ((F.col("__rank") - 1) % k).cast("int").alias("bin"),
    ]
    if seq_col is not None:
        # integer div: exact at any rank, no double rounding
        out.append(F.expr(f"((__rank - 1) div {k}) + 1").alias(seq_col))
    return ranked.select(*out)


def balanced_bin_summary(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Per-bin load report: (bin, n_rows, total_weight, max_weight)."""
    return (
        balanced_bins(df, id_col, weight_col, k)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("weight").alias("total_weight"),
            F.max("weight").alias("max_weight"),
        )
    )
