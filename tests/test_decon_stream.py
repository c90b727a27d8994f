"""Streaming eval-set decontamination (streaming/decon_stream.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.substring import contaminated_spans
from thymeflow_back_spark.streaming.decon_stream import (
    build_eval_index,
    process_decon_batch,
    read_decon_spans,
    run_streaming_decon,
)

pytestmark = pytest.mark.slow

W = 3

EVAL = [(100, "alpha beta gamma delta epsilon")]
TRAIN = [
    # doc 1: contains the eval 3-window 'beta gamma delta'
    (1, "x y beta gamma delta z w"),
    # doc 2: clean
    (2, "one two three four five six"),
    # doc 3: two separate matches merging into spans
    (3, "alpha beta gamma q q q gamma delta epsilon r"),
]


def _spanset(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in df.collect()
    }


def _run_stream(spark, base, batches, w=W):
    staging = os.path.join(base, "staging")
    index = os.path.join(base, "index")
    spans = os.path.join(base, "spans")
    ckpt = os.path.join(base, "ckpt")
    eval_df = spark.createDataFrame(EVAL, "doc_id long, text string")
    build_eval_index(eval_df, index, "doc_id", "text", w)
    for rows in batches:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(staging)
        q = run_streaming_decon(
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(staging),
            index,
            spans,
            ckpt,
            "doc_id",
            "text",
            w,
        )
        q.awaitTermination()
    return read_decon_spans(spark, spans)


def test_streamed_matches_batch(spark, tmp_path):
    """Streamed spans over micro-batches must equal the batch operator
    over the union — the identity that lets the catalog row reuse the
    batch oracle verbatim."""
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    eval_df = spark.createDataFrame(EVAL, "doc_id long, text string")
    truth = _spanset(contaminated_spans(train, eval_df, "doc_id", "text", W))
    assert truth  # the fixture really flags something
    got = _spanset(
        _run_stream(spark, str(tmp_path), [[TRAIN[0]], [TRAIN[1]], [TRAIN[2]]])
    )
    assert got == truth


def test_zero_span_batches_read_as_typed_empty(spark, tmp_path):
    out = _run_stream(spark, str(tmp_path), [[TRAIN[1]], [(4, "p q r s t")]])
    assert out.count() == 0
    assert out.columns == ["doc_id", "span_start", "span_end", "span_tokens"]
    # and before ANY batch the relation is a typed empty, not an error
    empty = read_decon_spans(spark, os.path.join(str(tmp_path), "nowhere"))
    assert empty.count() == 0


def test_replay_is_idempotent_and_index_write_once(spark, tmp_path):
    base = str(tmp_path)
    out = _run_stream(spark, base, [[TRAIN[0]], [TRAIN[2]]])
    before = _spanset(out)
    index = os.path.join(base, "index")
    spans = os.path.join(base, "spans")
    # a committed index is never rewritten
    eval2 = spark.createDataFrame(
        [(999, "totally different window text here")], "doc_id long, text string"
    )
    assert build_eval_index(eval2, index, "doc_id", "text", W) is False
    # checkpoint replay of batch 0 rewrites its own partition only
    replay = spark.createDataFrame([TRAIN[0]], "doc_id long, text string")
    process_decon_batch(
        replay, 0, index_dir=index, spans_dir=spans, id_col="doc_id",
        text_col="text", w=W,
    )
    assert _spanset(read_decon_spans(spark, spans)) == before
