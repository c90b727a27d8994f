"""Streaming multi-class langid trainer (streaming/langid_stream.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.langid_nb import (
    langid_classify,
    langid_train,
)
from thymeflow_back_spark.streaming.langid_stream import (
    langid_model_from_state,
    load_langid_state,
    run_streaming_langid,
)

pytestmark = pytest.mark.slow

B = 64

ROWS = [
    (1, "aaa bbb aaa bbb aaa", "aa"),
    (2, "aaa aaa bbb aaa aaa", "aa"),
    (3, "zzz yyy zzz yyy zzz", "zz"),
    (4, "yyy zzz zzz yyy yyy", "zz"),
    (5, "mmm nnn mmm nnn mmm", "mm"),
    (6, "nnn mmm nnn nnn mmm", "mm"),
]


def _run_stream(spark, base):
    schema = "doc_id long, text string, lang string"
    staging = os.path.join(base, "staging")
    state = os.path.join(base, "state")
    df = spark.createDataFrame(ROWS, schema)
    for parity in (0, 1):
        df.filter(F.col("doc_id") % 2 == parity).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = run_streaming_langid(stream, state, n_buckets=B)
    q.awaitTermination()
    return df, state


def test_streamed_model_equals_batch_model(spark, tmp_path):
    df, state = _run_stream(spark, str(tmp_path))
    ws, cs = langid_model_from_state(spark, state, "lang", B)
    wb, cb = langid_train(df, "doc_id", "text", "lang", n_buckets=B)
    assert sorted((r.lang, r.bucket, r.w_q) for r in ws.collect()) == sorted(
        (r.lang, r.bucket, r.w_q) for r in wb.collect()
    )
    assert sorted(map(tuple, cs.collect())) == sorted(map(tuple, cb.collect()))
    # and the served predictions agree end to end
    a = sorted(
        (r.doc_id, r.pred_lang, r.score_q)
        for r in langid_classify(df, "doc_id", "text", ws, cs, "lang", n_buckets=B).collect()
    )
    b = sorted(
        (r.doc_id, r.pred_lang, r.score_q)
        for r in langid_classify(df, "doc_id", "text", wb, cb, "lang", n_buckets=B).collect()
    )
    assert a == b
    # class doc counts rode the sentinel rows intact
    assert {(r.lang, r.n_docs) for r in cs.collect()} == {
        ("aa", 2), ("zz", 2), ("mm", 2)
    }


def test_state_is_bounded_and_replay_guard_holds(spark, tmp_path):
    df, state = _run_stream(spark, str(tmp_path))
    rows = load_langid_state(spark, state).collect()
    # bounded by construction: <= K*B cells + K sentinels
    assert len(rows) <= 3 * B + 3
    # the before=batch_id guard exposes the pre-batch state
    s0 = load_langid_state(spark, state, before=1)
    assert s0 is not None
    full = load_langid_state(spark, state)
    tot0 = sum(r.c for r in s0.filter(F.col("bucket") == -1).collect())
    tot1 = sum(r.c for r in full.filter(F.col("bucket") == -1).collect())
    assert tot0 == 3 and tot1 == 6  # one parity's docs, then all


def test_empty_state_raises(spark, tmp_path):
    with pytest.raises(RuntimeError, match="no committed langid state"):
        langid_model_from_state(spark, str(tmp_path / "nothing"), "lang", B)
