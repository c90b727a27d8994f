"""Bucketed parquet tables: shuffle-free co-located equi-joins.

At 100 TB the dominant cost of a fact-fact equi-join (orders x lineitem,
statements x statements) is the shuffle of both sides onto the join key.
Bucketing pays that shuffle ONCE at write time: `bucketBy(n, key)` hashes
every row into a fixed bucket file per partition, and Spark's scan reports
the resulting `HashPartitioning(key, n)` as its output partitioning — so a
join of two tables bucketed on their join keys with the same bucket count
plans with NO Exchange on either side (asserted in
tests/test_bucketed.py). The reference keeps its statement store inside a
single-JVM RDF4J SAIL where co-location is free (core/.../Repository
access); bucketing is the cluster-scale equivalent.

Sorted buckets (`sortBy`) additionally let the join skip the in-memory
sort of a sort-merge join and make per-bucket range scans cheap.

Bucket metadata lives in the session catalog (`saveAsTable`), the rows in
plain parquet at ``path`` — readable by any engine, bucket-aware only
through the catalog entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as an external bucketed parquet table.

    One shuffle now (hash on ``keys`` into ``n_buckets`` files) buys every
    future equi-join on ``keys`` against an equally-bucketed table a
    shuffle-free plan. ``sort_cols`` defaults to ``keys`` so sort-merge
    joins also skip their sort."""
    (
        df.repartition(n_buckets, *keys)  # one file per bucket, not per task
        .write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*(sort_cols or keys))
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two catalog tables; when both are bucketed on the join
    keys with equal bucket counts, the plan contains no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
