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
# whose LAST driver check is oldest lead the map. Round-9 state (from
# CORRECTNESS_r05..r08): r8's one red row first (q_dedup_weighted_jaccard,
# oracle BIGINT cast fixed this round — must be re-checked), then round-9
# additions (never driver-verified), then the 6 rows whose freshest check
# is r5, then the 50 r6 rows in registration order (r7's and r8's green
# rows are the freshest and fall to the tail via registration order).
_DRIVER_PRIORITY = [
    # r8's red row, fixed this round (oracle HUGEINT -> BIGINT cast):
    "q_dedup_weighted_jaccard",
    # round-9 additions, never driver-verified (each name is appended in the
    # commit that implements it — test_driver_priority_names_exist keeps the
    # list typo-free):
    "q_quality_classifier",
    "q_bpe_bytelevel_unicode",
    "q_classifier_holdout",
    "q_temperature_mixture",
    "q_classifier_bernoulli",
    "q_eval_decontamination",
    "q_streaming_nb_train",
    "q_mmr_rerank",
    "q_lm_backoff_score",
    "q_pii_luhn",
    # last driver-verified in round 5 (stalest existing rows):
    "q_streaming_window_counts",
    "q_tfidf_keywords",
    "q_top_order_per_customer",
    "q_user_sessions",
    "q_value_percentiles",
    "q_zorder_layout",
    # last driver-verified in round 6, registration order (overflow past
    # slot 50 rolls to round 10):
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
    "q_sample_weighted_by_lang",
    "q_cosine_topk",
    "q_embedding_near_dup",
    "q_embedding_near_dup_ann",
    "q_label_centroid_stats",
    "q_similarity_ivf",
    "q_similarity_jl_rerank",
    "q_kcenter_sample",
    "q_knn_classify",
    "q_similarity_filtered",
    "q_text_stats",
    "q_corpus_profile",
    "q_token_estimates",
    "q_doc_fingerprint",
    "q_lang_id",
    "q_text_repetition",
    "q_rdf_bgp_region",
    "q_rdf_ifp_sameas",
    "q_rdf_sameas_components",
    "q_rdf_construct_euro",
    "q_rdf_describe_nations",
    "q_rdf_rdfs_closure",
    "q_owl_closure",
    "q_primary_facet",
    "q_rdf_facet_rank",
    "q_asof_purchase_view",
    "q_events_pivot",
    "q_geo_track_length",
    "q_staypoints",
    "q_movement_smoothing",
    "q_er_part_names",
    "q_paris_agents",
    "q_agent_name_weights",
    "q_fts_part_search",
    "q_hybrid_rrf",
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
