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
# queries() order. After round 5 every catalog row has appeared green in
# SOME CORRECTNESS_r*.json; to keep that record fresh under rotation,
# rows whose LAST driver check is oldest lead the map: the round-6
# additions (never driver-verified), then the 29 rows last seen in r3,
# then the r4 block (r5's 50 rows are the freshest and go last).
_DRIVER_PRIORITY = [
    # round-6 additions, never driver-verified:
    "q_substring_spans",
    "q_distinct_kmv_by_group",
    "q_substring_scrub",
    "q_similarity_jl_rerank",
    "q_dedup_keep_best",
    "q_contamination_lsh",
    "q_dsir_resample",
    "q_kcenter_sample",
    "q_knn_classify",
    "q_hybrid_rrf",
    "q_quality_pr_curve",
    "q_score_auc",
    "q_balanced_bins",
    "q_similarity_filtered",
    "q_domain_quota",
    "q_sample_weighted_by_lang",
    # last driver-verified in round 3:
    "q_agent_name_weights",
    "q_asof_purchase_view",
    "q_corpus_profile",
    "q_cosine_topk",
    "q_doc_fingerprint",
    "q_embedding_near_dup",
    "q_embedding_near_dup_ann",
    "q_er_part_names",
    "q_events_pivot",
    "q_fts_part_search",
    "q_geo_track_length",
    "q_label_centroid_stats",
    "q_lang_id",
    "q_movement_smoothing",
    "q_owl_closure",
    "q_paris_agents",
    "q_primary_facet",
    "q_rdf_bgp_region",
    "q_rdf_construct_euro",
    "q_rdf_describe_nations",
    "q_rdf_facet_rank",
    "q_rdf_ifp_sameas",
    "q_rdf_rdfs_closure",
    "q_rdf_sameas_components",
    "q_similarity_ivf",
    "q_staypoints",
    "q_text_repetition",
    "q_text_stats",
    "q_token_estimates",
    # last driver-verified in round 4:
    "q_bloom_semijoin",
    "q_bpe_pair_counts",
    "q_cohort_retention",
    "q_contamination",
    "q_daily_order_stats",
    "q_dataset_mixture",
    "q_dedup_clusters",
    "q_dedup_exact",
    "q_dedup_jaccard_capped",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_prefix_filter",
    "q_dedup_simhash",
    "q_distinct_hll",
    "q_distinct_kmv",
    "q_doc_chunks",
    "q_funnel",
    "q_incremental_agg",
    "q_kcore",
    "q_lm_bigram_score",
    "q_pagerank",
    "q_pii_scrub",
    "q_quality_filter",
    "q_rolling_activity",
    "q_sample_fixed_n",
    "q_sample_stratified",
    "q_scd2_intervals",
    "q_sync_delta",
    "q_table_profile",
    "q_token_packing",
    "q_train_test_split",
    "q_triangle_stats",
    "q_url_canonical",
    "q_vocab_topk",
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
