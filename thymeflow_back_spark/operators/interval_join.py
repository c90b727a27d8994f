"""Interval-overlap joins without cross products.

The reference joins events×stays on temporal overlap (plus an overlap-ratio
and a distance filter) — LocationEventEnricher.scala:66-95 — with an O(n²)
in-heap loop. The scalable Spark shape: explode each interval onto the
fixed-width time buckets it covers, equi-join on (keys…, bucket) so the
shuffle is hash-partitioned and bounded, filter the exact overlap predicate,
and de-duplicate pairs that met in more than one bucket.

Bucket width should be on the order of the typical interval length: too small
multiplies rows, too large degenerates toward the cross product within a
bucket. AQE's skew-join splitting handles hot buckets at scale.

Interval bounds are epoch-microsecond BIGINTs (exact integer comparisons —
no float/timezone ambiguity between engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_buckets(df: DataFrame, start_us: str, end_us: str, bucket_us: int) -> DataFrame:
    return df.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_us) / F.lit(bucket_us)),
                F.floor(F.col(end_us) / F.lit(bucket_us)),
            )
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
    dedup_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Join rows whose [start, end] microsecond intervals overlap (inclusive).

    ``on`` — equi-join keys (e.g. user); column names must be unambiguous
    between the two sides apart from the ``on`` keys themselves.
    ``dedup_cols`` — identifying columns for pair de-duplication (defaults to
    all output columns).
    """
    bucket_us = bucket_seconds * 1_000_000
    lb = _with_buckets(left, left_start, left_end, bucket_us)
    rb = _with_buckets(right, right_start, right_end, bucket_us).withColumnRenamed("__bucket", "__bucket_r")
    # rename right-side keys so the output carries ONE unambiguous column per
    # join key (downstream F.col(key) / dropDuplicates would otherwise see
    # two identically-named columns)
    for k in on:
        rb = rb.withColumnRenamed(k, f"__r_{k}")
    cond = [lb[k] == rb[f"__r_{k}"] for k in on] + [lb["__bucket"] == rb["__bucket_r"]]
    joined = (
        lb.join(rb, cond)
        .filter((F.col(left_start) <= F.col(right_end)) & (F.col(right_start) <= F.col(left_end)))
        .drop("__bucket", "__bucket_r", *[f"__r_{k}" for k in on])
    )
    # a pair that overlaps k buckets appears k times — keep one
    return joined.dropDuplicates(list(dedup_cols) if dedup_cols else None)


def interval_overlap_self_join(
    df: DataFrame,
    on: Sequence[str],
    id_col: str,
    start_us: str,
    end_us: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All unordered pairs (a, b), a.id < b.id, of overlapping intervals.

    Output columns: ``on`` keys, a_id, b_id, a_start, a_end, b_start, b_end.
    """
    base = df.select(
        *on,
        F.col(id_col).alias("__id"),
        F.col(start_us).alias("__start"),
        F.col(end_us).alias("__end"),
    )
    a = base.select(
        *on,
        F.col("__id").alias("a_id"),
        F.col("__start").alias("a_start"),
        F.col("__end").alias("a_end"),
    )
    b = base.select(
        *[F.col(k).alias(f"__r_{k}") for k in on],
        F.col("__id").alias("b_id"),
        F.col("__start").alias("b_start"),
        F.col("__end").alias("b_end"),
    )
    bucket_us = bucket_seconds * 1_000_000
    ab = _with_buckets(a, "a_start", "a_end", bucket_us)
    bb = _with_buckets(b, "b_start", "b_end", bucket_us).withColumnRenamed("__bucket", "__bucket_r")
    cond = [ab[k] == bb[f"__r_{k}"] for k in on] + [ab["__bucket"] == bb["__bucket_r"]]
    return (
        ab.join(bb, cond)
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .drop("__bucket", "__bucket_r", *[f"__r_{k}" for k in on])
        .dropDuplicates([*on, "a_id", "b_id"])
    )
