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
# queries() order. Every catalog row has appeared green in SOME
# CORRECTNESS_r*.json (after r6, none's latest check is a fail); to keep
# that record fresh under rotation, rows whose LAST driver check is
# oldest lead the map: round-8 additions (never driver-verified), then
# the 37 rows whose freshest check is r5 (r7's slot-50 cap reached only
# the first 13 of the r5 block), then the r6 rows in registration order
# to fill slot 50 (r7's 50 are the freshest and fall to the tail via
# registration order).
_DRIVER_PRIORITY = [
    # round-8 additions, never driver-verified (each name is appended in the
    # commit that implements it — test_driver_priority_names_exist keeps the
    # list typo-free):
    "q_bpe_encode",
    "q_bpe_bytelevel",
    "q_token_budget_mixture",
    "q_gopher_repetition",
    "q_gopher_dup_ngrams",
    "q_tokenizer_fertility",
    "q_context_chunks",
    "q_kmeans_clusters",
    "q_search_ndcg",
    "q_embedding_gram",
    "q_label_propagation",
    "q_dedup_sorted_neighborhood",
    "q_lsh_recall_curve",
    "q_vocab_growth",
    "q_components_star",
    "q_dedup_weighted_jaccard",
    "q_streaming_heavy_hitters",
    "q_fts_phrase",
    "q_streaming_upsert_dedup",
    # last driver-verified in round 5 (stalest existing rows):
    "q_heavy_hitters",
    "q_heavy_hitters_by_lang",
    "q_location_events",
    "q_multimodal_audio",
    "q_multimodal_features",
    "q_orders_rollup",
    "q_outlier_mad",
    "q_overlapping_activity",
    "q_parts_by_brand",
    "q_pipeline_end2end",
    "q_pricing_summary",
    "q_priority_discounted_orders",
    "q_quantile_sketch",
    "q_rdf_group_concat",
    "q_rdf_grouped_path",
    "q_rdf_negated_pathset",
    "q_regional_revenue",
    "q_salted_agg",
    "q_salted_join",
    "q_sample_weighted",
    "q_semantic_dedup",
    "q_similarity_ivfpq",
    "q_similarity_jl",
    "q_similarity_pq",
    "q_similarity_pq_rerank",
    "q_similarity_sq8",
    "q_spatial_pairs",
    "q_split_leakage_safe",
    "q_streaming_near_dup",
    "q_streaming_quality_profile",
    "q_streaming_sessions",
    "q_streaming_window_counts",
    "q_tfidf_keywords",
    "q_top_order_per_customer",
    "q_user_sessions",
    "q_value_percentiles",
    "q_zorder_layout",
    # last driver-verified in round 6, earliest-registered first (overflow
    # past slot 50 rolls to round 9):
    "q_daily_order_stats",
    "q_cohort_retention",
    "q_dedup_keep_best",
    "q_contamination_lsh",
    "q_contamination",
    "q_bloom_semijoin",
    "q_bpe_pair_counts",
    "q_substring_spans",
    "q_substring_scrub",
    "q_distinct_kmv_by_group",
    "q_dsir_resample",
    "q_quality_pr_curve",
    "q_score_auc",
    "q_balanced_bins",
    "q_domain_quota",
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
