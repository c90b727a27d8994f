"""Streaming NB trainer (streaming/nb_stream.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.quality_nb import nb_classify, nb_train
from thymeflow_back_spark.streaming.nb_stream import (
    load_nb_state,
    nb_model_from_state,
)

pytestmark = pytest.mark.slow

B = 64

ROWS = [
    (1, "the cat sat on the mat and looked at the dog", True),
    (2, "a quick brown fox jumps over the lazy dog today", True),
    (3, "buy buy cheap cheap pills pills now now", False),
    (4, "the sun rises in the east and sets in the west", True),
    (5, "click here free money fast fast fast", False),
    (6, "an old tree stands in the quiet park near the lake", True),
]


def _run_stream(spark, base, schema="doc_id long, text string, label boolean"):
    from thymeflow_back_spark.streaming.nb_stream import run_streaming_nb

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
    q = run_streaming_nb(stream, state, n_buckets=B)
    q.awaitTermination()
    return df, state


def test_streamed_model_equals_batch_model(spark, tmp_path):
    df, state = _run_stream(spark, str(tmp_path))
    ws, ps = nb_model_from_state(spark, state, B)
    wb, pb = nb_train(df, "doc_id", "text", "label", B)
    assert sorted((r.bucket, r.w_q) for r in ws.collect()) == sorted(
        (r.bucket, r.w_q) for r in wb.collect()
    )
    assert ps.collect() == pb.collect()
    # and the served scores agree end to end
    a = sorted(
        (r.doc_id, r.score_q)
        for r in nb_classify(df, "doc_id", "text", ws, ps, B).collect()
    )
    b = sorted(
        (r.doc_id, r.score_q)
        for r in nb_classify(df, "doc_id", "text", wb, pb, B).collect()
    )
    assert a == b


def test_replay_guard_merges_against_pre_batch_state(spark, tmp_path):
    df, state = _run_stream(spark, str(tmp_path))
    before = sorted(
        (r.bucket, r.pos_cnt, r.neg_cnt)
        for r in load_nb_state(spark, state).collect()
    )
    # simulate a checkpoint replay of the LAST batch: re-run batch 1's
    # merge by hand — the before=batch_id guard must merge against state
    # 0, rewriting state 1 with IDENTICAL content (not double-counting).
    # Which parity landed in batch 1 depends on file-listing order, so
    # try both and require that exactly the matching one reproduces it.
    import posixpath

    from thymeflow_back_spark.streaming import nb_stream as S

    def remerge(parity):
        part = df.filter(F.col("doc_id") % 2 == parity)
        occ = S.unigram_bucket_rows(part, "doc_id", "text", B, "label")
        counts = occ.groupBy("bucket").agg(
            F.count_if(F.col("label")).alias("pos_cnt"),
            F.count_if(~F.col("label")).alias("neg_cnt"),
        )
        docs = part.groupBy().agg(
            F.lit(-1).cast("bigint").alias("bucket"),
            F.count_if(F.col("label")).alias("pos_cnt"),
            F.count_if(~F.col("label")).alias("neg_cnt"),
        )
        delta = counts.select("bucket", "pos_cnt", "neg_cnt").unionByName(docs)
        prev = load_nb_state(spark, state, before=1)
        merged = (
            delta.unionByName(prev)
            .groupBy("bucket")
            .agg(
                F.sum("pos_cnt").alias("pos_cnt"),
                F.sum("neg_cnt").alias("neg_cnt"),
            )
        )
        return sorted(
            (r.bucket, r.pos_cnt, r.neg_cnt) for r in merged.collect()
        )

    results = {p: remerge(p) for p in (0, 1)}
    matching = [p for p, r in results.items() if r == before]
    assert len(matching) == 1, "exactly one parity must be batch 1"
    # the idempotent rewrite: publishing the replayed merge changes nothing
    spark.createDataFrame(
        results[matching[0]], "bucket bigint, pos_cnt bigint, neg_cnt bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        posixpath.join(state, "state_b1")
    )
    after = sorted(
        (r.bucket, r.pos_cnt, r.neg_cnt)
        for r in load_nb_state(spark, state).collect()
    )
    assert after == before


def test_empty_state_raises(spark, tmp_path):
    with pytest.raises(RuntimeError, match="no committed NB state"):
        nb_model_from_state(spark, str(tmp_path / "nothing"), B)
