"""Streaming score-drift monitor: mergeable histograms vs a frozen reference.

The batch monitor (operators/evalcurves.py score_drift_psi, row
q_score_drift_psi) compares two static cohorts. A production pipeline
monitors an INGESTING stream: the reference cohort and its quantile
edges freeze once, and every arriving micro-batch updates the current
cohort's histogram — the continuous form of the same statistic.

Design (the nb_stream.py mergeable-statistics discipline):

- the REFERENCE is write-once committed state: the frozen cohort's
  quantile edges (``n_bins − 1`` rank-selected scores) and its bin
  histogram publish once under ``ref_dir`` (``_SUCCESS`` commit marker;
  a committed reference is never rewritten — monitoring against a
  moving baseline is the classic monitoring bug),
- per micro-batch: scores bin against the broadcast frozen edges (one
  pass, batch-sized) and the bin counts — PLAIN INTEGER SUMS — merge
  into batch-id-suffixed write-once state with the ``before=batch_id``
  replay guard. Because histograms merge exactly, the accumulated
  current histogram is BIT-IDENTICAL to binning the union of all
  batches at once,
- :func:`psi_from_drift_state` derives the per-bin PSI terms from the
  committed reference and the latest current state — so with the same
  cohort definitions, streamed PSI == the batch q_score_drift_psi row,
  and q_streaming_drift_psi reuses its oracle VERBATIM.

State is ``n_bins`` rows — constant, independent of corpus size; the
per-batch cost is one scan of the batch plus an ``n_bins``-row merge.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.evalcurves import (
    bin_counts_by_edges,
    psi_from_histograms,
    quantile_edges,
)
from .dedup_stream import _hadoop_fs
from .nb_stream import _STATE_PREFIX, _state_dirs


def build_drift_reference(
    ref_scored: DataFrame,
    ref_dir: str,
    score_col: str,
    tie_col: str,
    n_bins: int = 10,
) -> bool:
    """Publish the frozen reference: its quantile edges and its bin
    histogram, once (a committed reference returns False untouched)."""
    spark = ref_scored.sparkSession
    fs, _ = _hadoop_fs(spark, ref_dir)
    marker = spark._jvm.org.apache.hadoop.fs.Path(
        posixpath.join(ref_dir, "edges", "_SUCCESS")
    )
    if fs.exists(marker):
        return False
    edges = quantile_edges(ref_scored, score_col, tie_col, n_bins)
    # edges feed their own write AND the reference histogram — pin via
    # localCheckpoint so the rank pass runs once
    edges = edges.localCheckpoint(eager=True)
    hist = bin_counts_by_edges(ref_scored, score_col, edges)
    hist.coalesce(1).write.mode("overwrite").parquet(
        posixpath.join(ref_dir, "hist")
    )
    # edges last: the edges _SUCCESS is the commit point for BOTH sides
    # (a crash between the writes leaves an uncommitted reference that
    # the next build simply rewrites)
    edges.coalesce(1).write.mode("overwrite").parquet(
        posixpath.join(ref_dir, "edges")
    )
    return True


def load_drift_reference(
    spark: SparkSession, ref_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(edges, ref_hist) of the committed reference, or None."""
    fs, _ = _hadoop_fs(spark, ref_dir)
    marker = spark._jvm.org.apache.hadoop.fs.Path(
        posixpath.join(ref_dir, "edges", "_SUCCESS")
    )
    if not fs.exists(marker):
        return None
    return (
        spark.read.parquet(posixpath.join(ref_dir, "edges")),
        spark.read.parquet(posixpath.join(ref_dir, "hist")),
    )


def load_drift_state(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> DataFrame | None:
    """The latest committed current-cohort histogram (bin, n), or None;
    ``before`` is the replay guard (see nb_stream)."""
    dirs = _state_dirs(spark, state_dir)
    if before is not None:
        dirs = [d for d in dirs if d[0] < before]
    if not dirs:
        return None
    return spark.read.parquet(dirs[-1][1])


def run_streaming_drift(
    stream: DataFrame,
    ref_dir: str,
    state_dir: str,
    score_col: str,
    tie_col: str,
    n_bins: int = 10,
) -> StreamingQuery:
    """foreachBatch job accumulating the current cohort's histogram
    against the committed reference edges. The stream relation must
    carry (score_col, tie_col)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        ref = load_drift_reference(spark, ref_dir)
        if ref is None:
            raise RuntimeError(
                f"no committed drift reference under {ref_dir}; run "
                "build_drift_reference before starting the stream"
            )
        edges, _hist = ref
        delta = bin_counts_by_edges(batch, score_col, edges)
        prev = load_drift_state(spark, state_dir, before=batch_id)
        merged = delta if prev is None else (
            delta.unionByName(prev).groupBy("bin").agg(F.sum("n").alias("n"))
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


def psi_from_drift_state(
    spark: SparkSession,
    ref_dir: str,
    state_dir: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin PSI of everything streamed so far vs the frozen
    reference: (bin, ref_n, cur_n, psi_term) — bit-identical to the
    batch monitor over the same cohorts."""
    ref = load_drift_reference(spark, ref_dir)
    if ref is None:
        raise RuntimeError(f"no committed drift reference under {ref_dir}")
    _edges, ref_hist = ref
    cur = load_drift_state(spark, state_dir)
    if cur is None:
        cur = spark.createDataFrame([], "bin bigint, n bigint")
    return psi_from_histograms(spark, ref_hist, cur, n_bins)
