"""Threshold-sweep evaluation curves for filter calibration.

A curation pipeline tunes every gate (quality score, LM score, classifier
margin) by sweeping the threshold and reading precision/recall against a
reference label. Computing the full PR curve naively sorts the corpus by
score on one task; this operator aggregates per DISTINCT SCORE first — one
ordinary groupBy shuffle over the corpus — and runs the cumulative pass
over the score-group summary relation only (|distinct scores| rows, never
corpus-sized), using the deterministic distributed prefix sum
(operators/packing.py) so no unpartitioned window ever sees an unbounded
relation.

All outputs are exact: cumulative counts are bigint sums, precision /
recall are single bigint/bigint divisions — bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .packing import distributed_prefix_sum


def pr_curve(df: DataFrame, score_col: str, label_pred: Column) -> DataFrame:
    """PR curve swept over every distinct score threshold, descending.

    One row per distinct score s: (score, cum_n, cum_pos, prec, recall)
    where cum_n / cum_pos count rows with score >= s (the "keep everything
    scoring at least s" policy), prec = cum_pos / cum_n and recall =
    cum_pos / total positives. ``score_col`` must be numeric (the sweep
    orders thresholds descending via the negated score); ``label_pred``
    is a boolean Column marking positives.
    """
    labeled = df.select(
        F.col(score_col).alias("score"),
        F.when(label_pred, F.lit(1)).otherwise(F.lit(0)).alias("__pos"),
    )
    groups = labeled.groupBy("score").agg(
        F.count("*").alias("__n_at"), F.sum("__pos").alias("__pos_at")
    )
    g = groups.withColumn("__negscore", -F.col("score"))
    g = distributed_prefix_sum(g, "__negscore", "__n_at", "cum_n")
    g = distributed_prefix_sum(g, "__negscore", "__pos_at", "cum_pos")
    totals = labeled.agg(F.sum("__pos").alias("__total_pos"))
    return (
        g.crossJoin(F.broadcast(totals))
        .select(
            "score",
            F.col("cum_n").cast("bigint").alias("cum_n"),
            F.col("cum_pos").cast("bigint").alias("cum_pos"),
            (F.col("cum_pos") / F.col("cum_n")).alias("prec"),
            (F.col("cum_pos") / F.col("__total_pos")).alias("recall"),
        )
    )
