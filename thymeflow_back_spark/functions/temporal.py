"""Temporal scalar functions.

Reference surface: the two custom SPARQL functions `personal:duration` and
`personal:durationInMillis` (rdf/query/algebra/evaluation/function/
Duration.scala:19-36, DurationInMillis.scala:15-31) — end−start as ISO-8601
duration / milliseconds. Registered as Spark SQL functions by
``register_sql_functions`` so the SQL surface has them too.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def duration_millis(start: Column, end: Column) -> Column:
    """end − start in milliseconds (bigint)."""
    return ((F.unix_micros(end) - F.unix_micros(start)) / 1000).cast("bigint")


def iso_duration(start: Column, end: Column) -> Column:
    """end − start as an ISO-8601 dayTimeDuration string (PnDTnHnMn.nnnS)."""
    ms = F.unix_micros(end) - F.unix_micros(start)
    neg = ms < 0
    a = F.abs(ms)
    days = F.floor(a / F.lit(86_400_000_000))
    hours = F.floor(a / F.lit(3_600_000_000)) % 24
    mins = F.floor(a / F.lit(60_000_000)) % 60
    secs = (a % F.lit(60_000_000)) / 1_000_000.0
    body = F.concat(
        F.lit("P"),
        F.when(days > 0, F.concat(days.cast("string"), F.lit("D"))).otherwise(F.lit("")),
        F.lit("T"),
        F.when(hours > 0, F.concat(hours.cast("string"), F.lit("H"))).otherwise(F.lit("")),
        F.when(mins > 0, F.concat(mins.cast("string"), F.lit("M"))).otherwise(F.lit("")),
        F.concat(secs.cast("string"), F.lit("S")),
    )
    return F.when(neg, F.concat(F.lit("-"), body)).otherwise(body)


def register_sql_functions(spark: SparkSession) -> None:
    """FunctionRegistry analogue (reference RepositoryFactory.scala:248-251):
    make duration/durationInMillis callable from spark.sql() queries. These
    SQL-surface wrappers are row-at-a-time UDFs — fine for the SPARQL-style
    surface; DataFrame pipelines use the column expressions above instead."""
    from datetime import datetime

    def _millis(start: datetime, end: datetime):
        if start is None or end is None:
            return None
        return int((end - start).total_seconds() * 1000)

    spark.udf.register("duration_millis_sql", _millis, "bigint")
