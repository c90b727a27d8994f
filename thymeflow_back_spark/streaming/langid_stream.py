"""Streaming multi-class langid trainer: mergeable sufficient statistics.

The K-class generalization of streaming/nb_stream.py: the multi-class
language identifier's model (operators/langid_nb.py) is a closed-form
function of two integer aggregates — per-(class, bucket) char-n-gram
occurrence counts and per-class document counts. Both are PLAIN SUMS, so
they merge across micro-batches exactly: the streaming job accumulates
them per batch and the model derived from the running totals is
BIT-IDENTICAL to batch training over everything seen so far
(q_streaming_langid_train reuses q_langid_nb's oracle VERBATIM — the
identity IS the correctness statement).

State: up to K·``n_buckets`` (lang, bucket, c) rows plus ONE sentinel
row per class (bucket = -1) carrying the class document count — bounded
by the feature space times the language inventory, independent of
corpus size. Per micro-batch:

1. the batch's char-trigram occurrences fold to per-(class, bucket)
   counts (one distributed aggregate, map-side combine),
2. the prior state unions in and one groupBy-sum merges them,
3. the merged state publishes as a batch-id-suffixed parquet (write
   once, never modified — latest committed id wins; the nb_stream /
   hh_stream discipline). A checkpoint replay of batch N merges against
   the state BEFORE N (``before=batch_id``), so the rewrite is
   idempotent.

Serving reads the latest committed state and calls
``langid_model_from_counts`` — train-on-stream, serve-anytime.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.langid_nb import (
    LID_BUCKETS,
    LID_NGRAM,
    char_ngram_bucket_counts,
    langid_model_from_counts,
)
from .nb_stream import _STATE_PREFIX, _state_dirs


def load_langid_state(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> DataFrame | None:
    """The highest-batch-id committed state (lang, bucket, c), or None
    before any batch; ``before`` is the replay guard (see nb_stream)."""
    dirs = _state_dirs(spark, state_dir)
    if before is not None:
        dirs = [d for d in dirs if d[0] < before]
    if not dirs:
        return None
    return spark.read.parquet(dirs[-1][1])


def run_streaming_langid(
    stream: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = LID_NGRAM,
    n_buckets: int = LID_BUCKETS,
) -> StreamingQuery:
    """foreachBatch job accumulating the K-class sufficient statistics.
    The stream relation must carry (id_col, text_col, lang_col)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        counts = (
            char_ngram_bucket_counts(
                batch, id_col, text_col, n, n_buckets, lang_col
            )
            .groupBy(lang_col, "bucket")
            .agg(F.sum("cnt").alias("c"))
        )
        docs = batch.groupBy(lang_col).agg(
            F.lit(-1).cast("bigint").alias("bucket"),
            F.count("*").cast("bigint").alias("c"),
        ).select(lang_col, "bucket", "c")
        delta = counts.unionByName(docs)
        prev = load_langid_state(spark, state_dir, before=batch_id)
        merged = delta if prev is None else (
            delta.unionByName(prev)
            .groupBy(lang_col, "bucket")
            .agg(F.sum("c").alias("c"))
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            posixpath.join(state_dir, f"{_STATE_PREFIX}{batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", posixpath.join(state_dir, "_checkpoint")
        )
        .start()
    )


def langid_model_from_state(
    spark: SparkSession,
    state_dir: str,
    lang_col: str = "lang",
    n_buckets: int = LID_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """(weights, classes) from the latest committed streamed state —
    bit-identical to batch langid_train over everything ingested."""
    state = load_langid_state(spark, state_dir)
    if state is None:
        raise RuntimeError(f"no committed langid state under {state_dir}")
    counts = state.filter(F.col("bucket") >= 0)
    docs = state.filter(F.col("bucket") == -1).select(
        lang_col, F.col("c").alias("n_docs")
    )
    return langid_model_from_counts(counts, docs, lang_col, n_buckets)
