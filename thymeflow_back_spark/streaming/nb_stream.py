"""Streaming Naive Bayes trainer: mergeable integer sufficient statistics.

The batch trainer (operators/quality_nb.py) derives the model from two
integer aggregates — per-bucket class occurrence counts and class doc
counts. Both are PLAIN SUMS, so they merge across micro-batches with no
approximation: the streaming job accumulates them per batch and the model
derived from the running totals is BIT-IDENTICAL to batch training over
everything seen so far (q_streaming_nb_train reuses the batch oracle
verbatim — the identity IS the correctness statement).

State: ``n_buckets`` (bucket, pos_cnt, neg_cnt) rows plus ONE sentinel
row (bucket = -1) carrying the class document counts — bounded by the
feature-space size, independent of corpus size. Per micro-batch:

1. the batch's occurrence rows fold to per-bucket class counts (one
   distributed aggregate, map-side combine — never a driver collect),
2. the prior state unions in and one groupBy-sum merges them,
3. the merged state publishes as a batch-id-suffixed parquet (write once,
   never modified — latest id wins; the hh_stream.py discipline). A
   checkpoint replay of batch N merges against the state BEFORE N
   (``before=batch_id``), so the rewrite is idempotent.

Serving reads the latest committed state and calls
``nb_model_from_counts`` — train-on-stream, serve-anytime, with the
model always equal to "batch-train on everything ingested".
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.quality_nb import (
    QNB_BUCKETS,
    nb_model_from_counts,
    unigram_bucket_rows,
)

_STATE_PREFIX = "state_b"
_STATE_SCHEMA = "bucket bigint, pos_cnt bigint, neg_cnt bigint"


def _state_dirs(spark: SparkSession, state_dir: str) -> list[tuple[int, str]]:
    """COMMITTED (has _SUCCESS) state generations, ascending batch id —
    the hh_stream.py listing discipline."""
    from .dedup_stream import _hadoop_fs

    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, state_dir)
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith(_STATE_PREFIX):
            continue
        try:
            bid = int(name[len(_STATE_PREFIX):])
        except ValueError:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(
            posixpath.join(state_dir, name, "_SUCCESS")
        )
        if fs.exists(marker):
            out.append((bid, posixpath.join(state_dir, name)))
    return sorted(out)


def load_nb_state(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> DataFrame | None:
    """The highest-batch-id committed state (rows per _STATE_SCHEMA), or
    None before any batch. ``before`` restricts to ids < before — the
    replay guard: a re-delivered batch merges against the PRE-batch
    state, never its own crashed output."""
    dirs = _state_dirs(spark, state_dir)
    if before is not None:
        dirs = [d for d in dirs if d[0] < before]
    if not dirs:
        return None
    return spark.read.parquet(dirs[-1][1])


def run_streaming_nb(
    stream: DataFrame,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = QNB_BUCKETS,
    length_feature: bool = False,
) -> StreamingQuery:
    """foreachBatch job accumulating the NB sufficient statistics. The
    stream relation must carry (id_col, text_col, label_col)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        occ = unigram_bucket_rows(
            batch, id_col, text_col, n_buckets, label_col,
            length_feature=length_feature,
        )
        counts = occ.groupBy("bucket").agg(
            F.count_if(F.col(label_col)).alias("pos_cnt"),
            F.count_if(~F.col(label_col)).alias("neg_cnt"),
        )
        docs = batch.groupBy().agg(
            F.lit(-1).cast("bigint").alias("bucket"),
            F.count_if(F.col(label_col)).alias("pos_cnt"),
            F.count_if(~F.col(label_col)).alias("neg_cnt"),
        )
        delta = counts.select("bucket", "pos_cnt", "neg_cnt").unionByName(docs)
        prev = load_nb_state(spark, state_dir, before=batch_id)
        merged = delta if prev is None else (
            delta.unionByName(prev)
            .groupBy("bucket")
            .agg(
                F.sum("pos_cnt").alias("pos_cnt"),
                F.sum("neg_cnt").alias("neg_cnt"),
            )
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


def nb_model_from_state(
    spark: SparkSession, state_dir: str, n_buckets: int = QNB_BUCKETS
) -> tuple[DataFrame, DataFrame]:
    """(weights, prior) from the latest committed streamed state —
    bit-identical to batch nb_train over everything ingested."""
    state = load_nb_state(spark, state_dir)
    if state is None:
        raise RuntimeError(f"no committed NB state under {state_dir}")
    counts = state.filter(F.col("bucket") >= 0)
    docs = state.filter(F.col("bucket") == -1).select(
        F.col("pos_cnt").alias("n_pos_docs"),
        F.col("neg_cnt").alias("n_neg_docs"),
    )
    return nb_model_from_counts(counts, docs, n_buckets)
