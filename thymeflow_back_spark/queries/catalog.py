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


# The driver's per-round correctness file caps at 50 rows taken in
# queries() order, so rows the driver has never verified lead the map:
# these 25 were green only in local tools/check.py runs through round 4
# (every other catalog row already has a green CORRECTNESS_r1-r4 entry).
_DRIVER_PRIORITY = [
    # round-5 additions, never driver-verified:
    "q_heavy_hitters",
    "q_tfidf_keywords",
    "q_split_leakage_safe",
    "q_outlier_mad",
    "q_containment_join",
    "q_heavy_hitters_by_lang",
    "q_similarity_pq_rerank",
    "q_similarity_jl",
    "q_streaming_quality_profile",
    "q_quantile_sketch",
    "q_similarity_sq8",
    "q_similarity_pq",
    "q_similarity_ivfpq",
    "q_ann_recall",
    "q_semantic_dedup",
    "q_streaming_near_dup",
    "q_streaming_window_counts",
    "q_streaming_sessions",
    "q_counts_cm",
    "q_fts_bm25",
    "q_spatial_pairs",
    "q_zorder_layout",
    "q_rdf_grouped_path",
    "q_rdf_negated_pathset",
    "q_rdf_group_concat",
    "q_multimodal_features",
    "q_multimodal_audio",
    "q_sample_weighted",
    "q_deterministic_shuffle",
    "q_salted_join",
    "q_salted_agg",
    "q_dup_windows",
    "q_boilerplate_scrub",
    "q_pipeline_end2end",
]


def _ordered() -> list[str]:
    lead = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(lead)]
    return lead + rest


def query_map() -> dict[str, SparkQuery]:
    return {name: QUERIES[name].spark for name in _ordered()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered()
        if QUERIES[name].oracle is not None
    }
