"""Robust grouped statistics: exact medians and MAD outlier gates that
survive LOW-CARDINALITY groups.

`Window.partitionBy(group).orderBy(value)` computes per-group ranks by
moving EACH GROUP to one task — fine when groups are plentiful, a scale
failure when a 100 TB table has five event types (each "partition" is
20 TB on one core). These operators compute per-group ranks with the same
two-phase parallel scan the repo uses for global ranks
(operators/packing.py):

  1. one range shuffle on (group, value, tiebreak) — contiguous runs,
     every core busy regardless of group cardinality,
  2. per-physical-partition running counts in parallel,
  3. a #partitions-row offset pass plus a #groups-row group-start pass
     (both sketch-sized, broadcast back).

Rank within group = global rank in (group, value) order minus the number
of rows in earlier groups. The output depends only on the data and the
total (value, tiebreak) order — deterministic, so DuckDB's plain
`ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...)` oracle hash-matches.

On top of grouped ranks: the exact LOWER MEDIAN (the rank-ceil(n/2)
element — pure selection, no interpolation arithmetic, hence bit-equal
across engines) and the median-absolute-deviation outlier gate
(|x - median| > z * MAD), the robust-statistics workhorse for corpus
quality columns whose distributions have heavy tails that wreck
mean/stddev z-scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cachereg import pin
from .packing import distributed_prefix_sum


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    rank_col: str = "rn",
    n_col: str = "n",
) -> DataFrame:
    """Per-group 1-based row numbers in `order_cols` order, plus the group
    size — without a per-group single-task sort. (group_col, *order_cols)
    must be globally unique (same contract as distributed_prefix_sum).

    NULL group keys are a group of their own (the SQL `PARTITION BY`
    semantics both engines use): the offsets join-back is NULL-SAFE, and
    the range shuffle and the offsets window both order NULL first, so
    the two passes agree on where the NULL group starts."""
    ranked = distributed_prefix_sum(
        df, [group_col, *order_cols], F.lit(1).cast("bigint"), out_col="__grk"
    )
    counts = df.groupBy(group_col).agg(F.count("*").alias(n_col))
    # group-start offsets: a window over ONE ROW PER GROUP (bounded by
    # construction — the group-cardinality relation, not the data)
    before = Window.orderBy(group_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__before", F.coalesce(F.sum(n_col).over(before), F.lit(0).cast("bigint"))
    ).withColumnRenamed(group_col, "__grp")
    return (
        ranked.join(
            F.broadcast(offsets),
            F.col(group_col).eqNullSafe(F.col("__grp")),
        )
        .withColumn(rank_col, F.col("__grk") - F.col("__before"))
        .drop("__grk", "__before", "__grp")
    )


def grouped_lower_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "median",
    n_col: str = "n",
) -> DataFrame:
    """Exact lower median of `value_col` per group: (group, median, n).

    Lower median = the element at rank (n+1) div 2 of the sorted group —
    a selection, not an average, so even-sized groups produce a value that
    exists in the data and both engines agree bitwise."""
    r = grouped_rank(
        df.select(group_col, tiebreak_col, value_col),
        group_col,
        [value_col, tiebreak_col],
        rank_col="__rn",
        n_col=n_col,
    )
    return r.filter(F.col("__rn") == F.expr(f"({n_col} + 1) div 2")).select(
        group_col, F.col(value_col).alias(out_col), n_col
    )


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier report: (group, n, median, mad, n_outliers)
    where an outlier is |value - median| > z * MAD, both statistics exact
    lower medians. NULL values are excluded from every count.

    The two median passes each cost one range shuffle; the join back is a
    broadcast of the #groups-row stats relations. |x-m| and z*MAD are
    single IEEE operations — bit-stable cross-engine.

    The filtered input and the deviation relation are pinned (persisted
    via the cachereg registry — release with
    ``operators.cachereg.release_pinned`` once results are collected):
    each feeds BOTH a ranking pass and a join-back, and without pinning
    Spark re-derives the whole upstream subtree per consumer — the plan
    audit showed 16 source scans for what is logically one read."""
    e = pin(
        df.select(group_col, id_col, value_col).filter(
            F.col(value_col).isNotNull()
        )
    )
    med = grouped_lower_median(
        e, group_col, value_col, id_col, out_col="median", n_col="n"
    ).withColumnRenamed(group_col, "__grp")
    d = pin(
        e.join(F.broadcast(med), F.col(group_col).eqNullSafe(F.col("__grp")))
        .drop("__grp")
        .withColumn("adev", F.abs(F.col(value_col) - F.col("median")))
    )
    mad = grouped_lower_median(
        d.select(group_col, id_col, "adev"),
        group_col,
        "adev",
        id_col,
        out_col="mad",
        n_col="__n2",
    ).drop("__n2").withColumnRenamed(group_col, "__grp")
    z_lit: Column = F.lit(float(z))
    return (
        d.join(F.broadcast(mad), F.col(group_col).eqNullSafe(F.col("__grp")))
        .drop("__grp")
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n"),
            F.max("median").alias("median"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(F.col("adev") > z_lit * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )
