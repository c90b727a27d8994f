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
# whose LAST driver check is oldest lead the map. Round-10 state (from
# CORRECTNESS_r01..r09, 50/50 green in r9): the 17 rows whose freshest
# driver check is r6 lead (the §2-critical RDF/enricher rows among them),
# then round-10 additions (never driver-verified), then the 50 rows whose
# freshest check is r7 — the first ~27 of those fit the 50-row window, so
# after r10 no row's last driver check is older than r7. r8/r9-fresh rows
# fall to the tail via registration order.
_DRIVER_PRIORITY = [
    # last driver-verified in round 6 (stalest rows — OWL/RDFS closure,
    # PARIS, staypoints among them):
    "q_agent_name_weights",
    "q_asof_purchase_view",
    "q_er_part_names",
    "q_events_pivot",
    "q_fts_part_search",
    "q_geo_track_length",
    "q_hybrid_rrf",
    "q_movement_smoothing",
    "q_owl_closure",
    "q_paris_agents",
    "q_primary_facet",
    "q_rdf_construct_euro",
    "q_rdf_describe_nations",
    "q_rdf_facet_rank",
    "q_rdf_rdfs_closure",
    "q_rdf_sameas_components",
    "q_staypoints",
    # round-10 additions, never driver-verified, are appended here in the
    # commit that implements each (test_driver_priority_names_exist keeps
    # the list typo-free):
    "q_langid_nb",
    "q_langid_holdout",
    "q_ppl_buckets",
    "q_cluster_quota",
    "q_unigram_segment",
    "q_streaming_decontamination",
    "q_streaming_langid_train",
    "q_ccnet_filter",
    "q_unigram_fertility",
    "q_doremi_weights",
    "q_streaming_ivf_upsert",
    "q_langid_agreement",
    "q_unigram_hard_em",
    "q_score_drift_psi",
    "q_hard_negatives",
    "q_streaming_drift_psi",
    # last driver-verified in round 7, alphabetical (overflow past slot 50
    # rolls to round 11):
    "q_agents_by_nation",
    "q_ann_recall",
    "q_boilerplate_scrub",
    "q_bpe_train",
    "q_containment_join",
    "q_counts_cm",
    "q_customer_order_profile",
    "q_customers_without_orders",
    "q_dataset_mixture",
    "q_dedup_clusters",
    "q_dedup_consecutive",
    "q_dedup_exact",
    "q_dedup_jaccard_capped",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_prefix_filter",
    "q_dedup_simhash",
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
