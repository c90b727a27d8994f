"""Streaming eval-set decontamination: probe-on-arrival ExactSubstr.

The batch form (operators/substring.py contaminated_spans, row
q_eval_decontamination) flags maximal train-document spans matching a
w-token window of the eval set. A continuously-ingesting pipeline needs
the INCREMENTAL form: the eval benchmark is fixed up front, train
documents arrive as micro-batches, and each batch is probed against the
eval index on arrival — the round-9 verdict's gap #4.

Design (the nb_stream.py / dedup_stream.py disciplines):

- the EVAL WINDOW INDEX is write-once replay-guarded state: the eval
  set's DISTINCT w-token window texts, published once as parquet with
  the ``_SUCCESS`` commit marker; ``build_eval_index`` is idempotent
  (a committed index is never rewritten, so every batch probes the
  same relation),
- per micro-batch: the batch's token windows semi-join the broadcast
  eval index, flagged positions merge into maximal spans per document
  (the gaps-and-islands pass — state is one document's positions), and
  the spans write to a ``batch_id``-partitioned log with dynamic
  overwrite, so a checkpoint replay rewrites its own partitions
  (idempotent, the dedup_stream write discipline),
- a document's spans depend ONLY on that document and the fixed eval
  index, so streamed output over N batches is BIT-IDENTICAL to the
  batch operator over their union — q_streaming_decontamination reuses
  q_eval_decontamination's oracle VERBATIM (the q_streaming_nb_train
  identity-as-correctness pattern).

Per-batch cost is batch-sized: one window explode, one semi-join against
the (eval-benchmark-sized, broadcast) index, one per-document window
pass. No full-corpus read ever happens after index build.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import token_window_rows
from ..operators.substring import _islands
from .dedup_stream import _hadoop_fs

_SPAN_FIELDS = "span_start int, span_end int, span_tokens int"


def build_eval_index(
    eval_df: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
) -> bool:
    """Publish the eval set's distinct window texts as the probe index —
    write-once: a committed index (``_SUCCESS`` present) is left
    untouched and False is returned, so stream restarts never change
    what earlier batches were probed against."""
    spark = eval_df.sparkSession
    fs, jpath = _hadoop_fs(spark, index_dir)
    marker = spark._jvm.org.apache.hadoop.fs.Path(
        posixpath.join(index_dir, "_SUCCESS")
    )
    if fs.exists(marker):
        return False
    (
        token_window_rows(eval_df, id_col, text_col, w)
        .select("win")
        .dropDuplicates()
        .write.mode("overwrite")
        .parquet(index_dir)
    )
    return True


def process_decon_batch(
    batch: DataFrame,
    batch_id: int,
    *,
    index_dir: str,
    spans_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
) -> None:
    """Probe one train micro-batch against the committed eval index and
    append its spans to the batch-partitioned log (dynamic overwrite —
    a replayed batch rewrites its own partition)."""
    if batch.isEmpty():
        return
    spark = batch.sparkSession
    ewins = spark.read.parquet(index_dir)
    wins = token_window_rows(batch, id_col, text_col, w)
    # the index is eval-benchmark-sized by contract — broadcast it so the
    # probe is a map-side semi-join (no shuffle of the batch's windows)
    flagged = wins.join(F.broadcast(ewins), "win", "left_semi").select(
        id_col, "pos"
    )
    spans = _islands(flagged, id_col, w)
    (
        spans.withColumn("batch_id", F.lit(batch_id))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(spans_dir)
    )


def run_streaming_decon(
    train: DataFrame,
    index_dir: str,
    spans_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start the probe-on-arrival decontamination job on a train-document
    stream; ``build_eval_index`` must have committed the index first."""

    def process(batch: DataFrame, batch_id: int) -> None:
        process_decon_batch(
            batch,
            batch_id,
            index_dir=index_dir,
            spans_dir=spans_dir,
            id_col=id_col,
            text_col=text_col,
            w=w,
        )

    return (
        train.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_decon_spans(
    spark: SparkSession,
    spans_dir: str,
    id_field: str = "doc_id bigint",
) -> DataFrame:
    """All spans flagged so far: (id, span_start, span_end, span_tokens).
    The schema is EXPLICIT, so batches that flagged zero spans (their
    partition holds only ``_SUCCESS``, no parquet footers) read as empty
    instead of failing inference; before any batch the relation is a
    typed empty."""
    schema = f"{id_field}, {_SPAN_FIELDS}"
    fs, jpath = _hadoop_fs(spark, spans_dir)
    if not fs.exists(jpath):
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(f"{schema}, batch_id bigint")
        .option("basePath", spans_dir)
        .parquet(spans_dir)
        .drop("batch_id")
    )
