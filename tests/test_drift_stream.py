"""Streaming drift monitor (streaming/drift_stream.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.evalcurves import score_drift_psi
from thymeflow_back_spark.streaming.drift_stream import (
    build_drift_reference,
    load_drift_state,
    psi_from_drift_state,
    run_streaming_drift,
)

pytestmark = pytest.mark.slow

N_BINS = 4


def _scored(spark, rows):
    return spark.createDataFrame(rows, "rid long, score long")


def _run(spark, base, ref_rows, batches):
    ref_dir = os.path.join(base, "ref")
    state = os.path.join(base, "state")
    staging = os.path.join(base, "staging")
    assert build_drift_reference(
        _scored(spark, ref_rows), ref_dir, "score", "rid", N_BINS
    )
    for rows in batches:
        _scored(spark, rows).coalesce(1).write.mode("append").parquet(staging)
        q = run_streaming_drift(
            spark.readStream.schema("rid long, score long")
            .option("maxFilesPerTrigger", "1")
            .parquet(staging),
            ref_dir,
            state,
            "score",
            "rid",
            N_BINS,
        )
        q.awaitTermination()
    return ref_dir, state


def test_streamed_psi_equals_batch_monitor(spark, tmp_path):
    ref = [(i, i * 3 % 17) for i in range(0, 40, 2)]
    cur = [(i, (i * 5 + 4) % 23) for i in range(1, 40, 2)]
    batches = [cur[:7], cur[7:12], cur[12:]]
    ref_dir, state = _run(spark, str(tmp_path), ref, batches)
    streamed = sorted(
        map(tuple, psi_from_drift_state(spark, ref_dir, state, N_BINS).collect())
    )
    both = _scored(spark, [(r, s) for r, s in ref + cur])
    batch = sorted(
        map(
            tuple,
            score_drift_psi(
                both, F.col("rid") % 2 == 0, "score", "rid", N_BINS
            ).collect(),
        )
    )
    assert streamed == batch
    # identical cohorts => every psi_term is exactly 0 when cur == ref
    same_dir = str(tmp_path / "same")
    rd2, st2 = _run(spark, same_dir, ref, [ref])
    zero = psi_from_drift_state(spark, rd2, st2, N_BINS).collect()
    assert all(r.psi_term == 0.0 for r in zero)
    assert all(r.ref_n == r.cur_n for r in zero)


def test_reference_freezes_and_state_is_bounded(spark, tmp_path):
    ref = [(i, i % 7) for i in range(0, 30, 2)]
    cur = [(i, i % 11) for i in range(1, 30, 2)]
    ref_dir, state = _run(spark, str(tmp_path), ref, [cur])
    # a committed reference is never rewritten
    assert (
        build_drift_reference(
            _scored(spark, [(999, 999)]), ref_dir, "score", "rid", N_BINS
        )
        is False
    )
    st = load_drift_state(spark, state)
    assert st.count() <= N_BINS  # constant-size state
    # replay guard: before batch 0 there is no state
    assert load_drift_state(spark, state, before=0) is None
