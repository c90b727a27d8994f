"""Streaming heavy hitters (streaming/hh_stream.py)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.streaming.hh_stream import (
    exact_heavy_hitters_from_state,
    load_hh_state,
    merge_mg,
    run_streaming_heavy_hitters,
)
from thymeflow_back_spark.operators.text import toks_col
from thymeflow_back_spark.tables import load

K = 40


@pytest.fixture(scope="module")
def state(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("hhstream")
    staging, st = str(base / "staging"), str(base / "state")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    for parity in (0, 1):
        docs.filter(F.col("doc_id") % 2 == parity).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = run_streaming_heavy_hitters(
        stream.select(F.explode(toks_col("text")).alias("token")),
        "token", K, st,
    )
    q.awaitTermination()
    return st


def test_state_total_is_exact(spark, sf_dir, state):
    docs = load(spark, sf_dir, "documents")
    n = docs.select(F.explode(toks_col("text")).alias("t")).count()
    counters, total = load_hh_state(spark, state, "token")
    assert total == n
    assert 0 < len(counters) <= K


def test_streamed_equals_batch_operator(spark, sf_dir, state):
    from thymeflow_back_spark.operators.heavyhitters import heavy_hitters

    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(toks_col("text")).alias("token"))
    got = sorted(
        (r.token, r.cnt)
        for r in exact_heavy_hitters_from_state(
            spark, state, tokens, "token", K
        ).collect()
    )
    want = sorted(
        (r.token, r.cnt) for r in heavy_hitters(tokens, "token", K).collect()
    )
    assert got == want and got


def test_replay_guard_reads_pre_batch_state(spark, state):
    # before=<max id> must exclude the latest summary — the checkpoint
    # replay path merges against the PRE-batch state
    from thymeflow_back_spark.streaming.hh_stream import _state_dirs

    dirs = _state_dirs(spark, state)
    assert len(dirs) >= 2  # two micro-batches published two summaries
    last_id = dirs[-1][0]
    full = load_hh_state(spark, state, "token")
    pre = load_hh_state(spark, state, "token", before=last_id)
    assert pre[1] < full[1]  # strictly earlier total


def test_merge_mg_superset_guarantee():
    """Seeded adversarial sweep: a heavy token buried in churning tail
    vocabulary must survive chunked MG merging whenever its global count
    exceeds N/k (the mergeable-summaries bound)."""
    import random

    rng = random.Random(7)
    k = 20
    stream = ["HOT"] * 600 + [f"tail{i}" for i in range(8000)]
    rng.shuffle(stream)
    n = len(stream)
    assert 600 * k > n  # HOT is a true heavy hitter
    state: dict[str, int] = {}
    for i in range(0, n, 500):  # 500-token chunks play micro-batches
        chunk = stream[i : i + 500]
        counts: dict[str, int] = {}
        for t in chunk:
            counts[t] = counts.get(t, 0) + 1
        state = merge_mg(state, list(counts.items()), k)
    assert "HOT" in state
    assert len(state) <= k


def test_torn_state_dir_is_ignored(spark, state, tmp_path):
    """A summary directory without _SUCCESS (crash mid-overwrite) must be
    invisible to state loads; non-numeric siblings must be skipped."""
    import os
    import shutil

    st = str(tmp_path / "state2")
    shutil.copytree(state, st)
    before = load_hh_state(spark, st, "token")
    # torn leftover with a HIGHER batch id than anything committed
    torn = os.path.join(st, "summary_b999")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet at all")
    os.makedirs(os.path.join(st, "summary_b3.bak"), exist_ok=True)
    after = load_hh_state(spark, st, "token")
    assert after == before
