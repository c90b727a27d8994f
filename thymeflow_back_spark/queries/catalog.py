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
# CORRECTNESS_r*.json; to keep that record fresh under rotation, rows
# whose LAST driver check is oldest lead the map. Round-11 state
# (computed from CORRECTNESS_r01..r10 last-green histogram: 50 r10,
# 50 r9, 49 r8, 33 r7): the 33 rows whose freshest driver check is r7
# lead, then round-11 additions (never driver-verified), then the 49
# r8-fresh rows alphabetically — whatever fits the 50-row window after
# the stale+new rows; overflow rolls to round 12. r9/r10-fresh rows
# fall to the tail via registration order.
_DRIVER_PRIORITY = [
    # last driver-verified in round 7 (stalest — q_sync_delta is the
    # §2.1 EmailSynchronizer row; pagerank/kcore/triangles/sketches are
    # the §8-critical ones):
    "q_deterministic_shuffle",
    "q_distinct_hll",
    "q_distinct_kmv",
    "q_doc_chunks",
    "q_dsir_logratio",
    "q_dup_windows",
    "q_event_histogram",
    "q_events_json",
    "q_fts_bm25",
    "q_funnel",
    "q_html_extract",
    "q_html_quality_funnel",
    "q_incremental_agg",
    "q_kcenter_parallel",
    "q_kcore",
    "q_lm_bigram_score",
    "q_pagerank",
    "q_pii_scrub",
    "q_pretoken_counts",
    "q_quality_filter",
    "q_rolling_activity",
    "q_sample_fixed_n",
    "q_sample_stratified",
    "q_scd2_intervals",
    "q_shard_manifest",
    "q_sync_delta",
    "q_table_profile",
    "q_time_pruned_revenue",
    "q_token_packing",
    "q_train_test_split",
    "q_triangle_stats",
    "q_url_canonical",
    "q_vocab_topk",
    # round-11 additions, never driver-verified, appended here in the
    # commit that implements each (test_driver_priority_names_exist
    # keeps the list typo-free):
    "q_semantic_components",
    "q_streaming_components",
    "q_lsh_param_select",
    # last driver-verified in round 8, alphabetical (overflow past
    # slot 50 rolls to round 12):
    "q_bpe_bytelevel",
    "q_bpe_encode",
    "q_components_star",
    "q_context_chunks",
    "q_dedup_sorted_neighborhood",
    "q_embedding_gram",
    "q_fts_phrase",
    "q_gopher_dup_ngrams",
    "q_gopher_repetition",
    "q_heavy_hitters",
    "q_heavy_hitters_by_lang",
    "q_kmeans_clusters",
    "q_label_propagation",
    "q_location_events",
    "q_lsh_recall_curve",
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
    "q_search_ndcg",
    "q_semantic_dedup",
    "q_similarity_ivfpq",
    "q_similarity_jl",
    "q_similarity_pq",
    "q_similarity_pq_rerank",
    "q_similarity_sq8",
    "q_spatial_pairs",
    "q_split_leakage_safe",
    "q_streaming_heavy_hitters",
    "q_streaming_near_dup",
    "q_streaming_quality_profile",
    "q_streaming_sessions",
    "q_streaming_upsert_dedup",
    "q_token_budget_mixture",
    "q_tokenizer_fertility",
    "q_vocab_growth",
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
