"""Partitioning invariance: results must not depend on the shuffle layout.

At 1000 executors the physical partitioning is different every run; any
query whose VALUES change with spark.sql.shuffle.partitions is broken at
scale even if it hash-matches its oracle on one layout. This suite runs
representative order-sensitive queries (prefix sums, A-ES selection,
greedy argmax chains, cluster election, window ranks) under widely
different shuffle-partition counts and asserts bit-identical results.
"""

from __future__ import annotations

import pytest

from thymeflow_back_spark import queries as catalog

SF = "/root/testdata/sf0.001"

# queries whose implementation leans on ordering / partition-dependent
# machinery: distributed prefix sums, range shuffles, struct-MAX argmax,
# per-partition Misra-Gries, A-ES top-n, greedy selection
NAMES = [
    "q_token_packing",
    "q_outlier_mad",
    "q_heavy_hitters",
    "q_dedup_clusters",
    "q_sample_weighted",
    "q_dsir_resample",
    "q_dsir_logratio",
    "q_kcenter_sample",
    "q_quality_pr_curve",
    "q_score_auc",
    "q_hybrid_rrf",
    # round 7: batched greedy selection, batched BPE safe-prefix
    # acceptance, Arrow-parse + per-group fold (the shard WRITER's layout
    # invariance is tested against fresh directories in test_shards.py —
    # its write-once catalog row would trivially pass here)
    "q_kcenter_parallel",
    "q_bpe_train",
    "q_html_quality_funnel",
    # round 10: prefix-sum tertile ranks, per-doc argmax windows, exact
    # quantile-edge selection, Arrow-batched Viterbi over distinct words
    "q_ppl_buckets",
    "q_langid_nb",
    "q_ccnet_filter",
    "q_score_drift_psi",
    "q_unigram_segment",
]


def _rows(spark, name):
    df = catalog.QUERIES[name].spark(spark, SF)
    cols = sorted(df.columns)
    out = [tuple(str(r[c]) for c in cols) for r in df.collect()]
    return sorted(out)


@pytest.mark.parametrize("name", NAMES)
def test_result_invariant_under_shuffle_partitions(spark, name):
    from thymeflow_back_spark.operators.cachereg import release_pinned

    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "5")
        a = _rows(spark, name)
        release_pinned()
        spark.conf.set(key, "47")
        b = _rows(spark, name)
        release_pinned()
    finally:
        spark.conf.set(key, orig)
    assert a == b


@pytest.mark.parametrize("name", ["q_token_packing", "q_outlier_mad",
                                  "q_dsir_resample", "q_hybrid_rrf",
                                  "q_dedup_clusters", "q_balanced_bins"])
def test_result_invariant_under_aqe_toggle(spark, name):
    """AQE rewrites exchanges and coalesces partitions at runtime; values
    must not depend on whether it ran."""
    from thymeflow_back_spark.operators.cachereg import release_pinned

    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        a = _rows(spark, name)
        release_pinned()
        spark.conf.set(key, "true")
        b = _rows(spark, name)
        release_pinned()
    finally:
        spark.conf.set(key, orig)
    assert a == b
