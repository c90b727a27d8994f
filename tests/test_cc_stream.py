"""Incremental connected components over an edge stream (streaming/cc_stream.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.closure import connected_components_star
from thymeflow_back_spark.streaming.cc_stream import (
    compact_cc_state,
    current_components,
    process_cc_batch,
    run_streaming_components,
)

pytestmark = pytest.mark.slow


def _batch(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _labels(spark, state):
    return sorted(
        (r.node, r.component) for r in current_components(spark, state).collect()
    )


def _batch_labels(spark, all_edges):
    df = _batch(spark, all_edges)
    return sorted(
        (r.node, r.component)
        for r in connected_components_star(df).collect()
    )


def test_streamed_equals_batch_with_cross_batch_merges(spark, tmp_path):
    state = str(tmp_path / "state")
    batches = [
        [(0, 1), (1, 2), (10, 11), (20, 21)],   # three components
        [(2, 10), (30, 31)],                     # merge {0..2}+{10,11}; new comp
        [(21, 30), (11, 20)],                    # chain all the right-side comps
    ]
    seen = []
    for i, edges in enumerate(batches):
        process_cc_batch(_batch(spark, edges), i, state_dir=state)
        seen += edges
        assert _labels(spark, state) == _batch_labels(spark, seen), f"batch {i}"


def test_long_chain_merge_and_wholesale_relabel(spark, tmp_path):
    # adversarial: two long chains built in separate batches, then a single
    # bridge edge must relabel the ENTIRE higher-labeled chain
    state = str(tmp_path / "state")
    chain_a = [(i, i + 1) for i in range(0, 30)]
    chain_b = [(i, i + 1) for i in range(100, 130)]
    process_cc_batch(_batch(spark, chain_a), 0, state_dir=state)
    process_cc_batch(_batch(spark, chain_b), 1, state_dir=state)
    process_cc_batch(_batch(spark, [(30, 100)]), 2, state_dir=state)
    labels = dict(_labels(spark, state))
    assert set(labels.values()) == {0}
    assert len(labels) == 62


def test_streaming_driver_and_compaction_lifecycle(spark, tmp_path):
    staging = str(tmp_path / "staging")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    all_edges = [(0, 1), (1, 2), (10, 11), (2, 10), (20, 21)]

    def drain():
        q = run_streaming_components(
            spark.readStream.schema("src long, dst long")
            .option("maxFilesPerTrigger", "1")
            .parquet(staging),
            state,
            ckpt,
        )
        q.awaitTermination()

    _batch(spark, all_edges[:3]).coalesce(1).write.mode("append").parquet(staging)
    drain()
    before = _labels(spark, state)
    stats = compact_cc_state(spark, state)
    assert stats["nodes"] == 5
    assert _labels(spark, state) == before
    names = set(os.listdir(state))
    assert "base-0" in names
    assert not any(n.startswith("batch_id=") for n in names)
    # post-compaction live batch merges a base component
    _batch(spark, all_edges[3:]).coalesce(1).write.mode("append").parquet(staging)
    drain()
    assert _labels(spark, state) == _batch_labels(spark, all_edges)
    # second fold covers base + live tail
    assert compact_cc_state(spark, state)["nodes"] == 7
    assert _labels(spark, state) == _batch_labels(spark, all_edges)


def test_replay_after_compaction_noops_and_fresh_checkpoint_raises(spark, tmp_path):
    state = str(tmp_path / "state")
    process_cc_batch(_batch(spark, [(0, 1), (2, 3)]), 0, state_dir=state)
    process_cc_batch(_batch(spark, [(1, 2)]), 1, state_dir=state)
    compact_cc_state(spark, state)
    before = _labels(spark, state)
    # replay of folded batch 1: all endpoints known -> no-op
    process_cc_batch(_batch(spark, [(1, 2)]), 1, state_dir=state)
    assert _labels(spark, state) == before
    assert not any(n.startswith("batch_id=") for n in os.listdir(state))
    # fresh-checkpoint misuse: batch 0 of a NEW stream touches unknown node
    with pytest.raises(RuntimeError, match="fresh checkpoint"):
        process_cc_batch(_batch(spark, [(3, 99)]), 0, state_dir=state)


def test_relabel_read_is_partition_pruned(spark, tmp_path):
    # the remap rewrite must read only comp_bucket partitions of merged
    # labels: after ingesting one batch, verify the state layout exposes
    # comp_bucket partitions (the prune axis) and that a bucket-filtered
    # read shows PartitionFilters in the physical plan
    state = str(tmp_path / "state")
    process_cc_batch(
        _batch(spark, [(i, i + 1) for i in range(0, 40, 2)]), 0, state_dir=state
    )
    sub = os.listdir(os.path.join(state, "batch_id=0"))
    assert any(n.startswith("comp_bucket=") for n in sub)
    df = (
        spark.read.option("basePath", state)
        .parquet(os.path.join(state, "batch_id=0"))
        .filter(F.col("comp_bucket").isin([0, 1]))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "comp_bucket" in plan.split("PartitionFilters", 1)[1][:250]
