"""Query registry: name -> (spark impl, oracle SQL, bench flag).

Conventions (driver compare is column-name-sorted value hashing):
- Alias every computed column identically in Spark and oracle SQL.
- Monetary/quantity aggregates go through exact decimal arithmetic and are
  cast back to double only at the end, so Spark and DuckDB produce bit-equal
  values regardless of float summation order (see ``dec``/``dsum``).
- Every query must be fully deterministic: total ordering inside any window,
  explicit tie-breaks for any top-k.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None, bench: bool = False, doc: str = ""):
    """Decorator registering a query implementation."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, bench=bench, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def query_map() -> dict[str, SparkQuery]:
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
