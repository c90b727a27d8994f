"""Streaming IVF index maintenance: upsert-aware vector ingestion.

A retrieval corpus is not static — embeddings arrive continuously and
documents are RE-EMBEDDED on update (the reference's re-delivery
contract, Pipeline.scala:61-93, applied to vectors). Rebuilding the IVF
index (operators/ivf.py) per batch is O(corpus); this job maintains it
incrementally, the production vector-database pattern:

- the COARSE QUANTIZER freezes on the FIRST batch: content-addressed
  seeds + one Lloyd refinement over batch 0's vectors, published once as
  a committed JSON artifact (write-once, the decon_stream index
  discipline — production systems retrain the quantizer offline, never
  per insert). Every later batch assigns against the same centroids, so
  cell routing is stable and map-side,
- per batch: one broadcast-centroid argmax assignment pass, then the
  (c_id, cell, c_vec) rows write partitioned by (batch_id, cell) with
  dynamic overwrite — a checkpoint replay rewrites its own partitions
  (idempotent, the dedup_stream discipline),
- versioning is the upsert_dedup design: no retractions — an id's
  CURRENT vector is its max-batch entry, computed at read time from the
  store's (c_id, batch_id) column projection. A re-embedded vector may
  move cells; the stale entry in the old cell loses the version check
  and never surfaces,
- search (:func:`current_ivf_topk`) probes the ``n_probe`` nearest
  cells per query: the cell predicate prunes partitions BEFORE the
  version join, so per-query work stays ~n_probe/n_cells of the
  corpus regardless of how many batches accreted.

Correctness identity: with the quantizer fixed, the current view's
top-k equals batch IVF over the latest-version corpus with the same
centroids — q_streaming_ivf_upsert's oracle replays exactly that
(train on batch 0, index the upserted corpus).
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from ..operators.ivf import (
    N_CELLS,
    N_PROBE,
    _cell_scores,
    ivf_assign,
    refine_centroids,
    seed_centroids,
)
from ..operators.similarity import SCORE_DECIMALS, as_double_array, dot, norm
from .dedup_stream import _hadoop_fs


def _centroids_path(index_dir: str) -> str:
    return posixpath.join(index_dir, "centroids")


def load_stream_centroids(
    spark: SparkSession, index_dir: str
) -> list[list[float]] | None:
    """The committed quantizer, or None before the first batch."""
    path = _centroids_path(index_dir)
    fs, _ = _hadoop_fs(spark, path)
    marker = spark._jvm.org.apache.hadoop.fs.Path(
        posixpath.join(path, "_SUCCESS")
    )
    if not fs.exists(marker):
        return None
    (row,) = spark.read.json(path).collect()
    return json.loads(row.centroids)


def process_ivf_batch(
    batch: DataFrame,
    batch_id: int,
    *,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = N_CELLS,
    refine_iters: int = 1,
) -> None:
    """Ingest one micro-batch: train-once quantizer, assign, append."""
    if batch.isEmpty():
        return
    spark = batch.sparkSession
    # within-batch re-delivery has no order to resolve by — refuse loudly
    # (the caller routes updates to separate batches; cheap: one agg over
    # the micro-batch)
    dup = (
        batch.groupBy(id_col).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(
            f"batch {batch_id} delivers some {id_col} more than once; "
            "within-batch upserts are unordered — deliver updates in a "
            "later micro-batch"
        )
    cents = load_stream_centroids(spark, index_dir)
    if cents is None:
        cents = seed_centroids(batch, id_col, vec_col, n_cells)
        if refine_iters:
            cents = refine_centroids(batch, id_col, vec_col, cents, refine_iters)
        spark.createDataFrame(
            [(json.dumps(cents),)], "centroids string"
        ).coalesce(1).write.mode("overwrite").json(_centroids_path(index_dir))
    assign = ivf_assign(batch, id_col, vec_col, cents)
    (
        assign.withColumn("batch_id", F.lit(batch_id))
        .write.partitionBy("batch_id", "cell")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(posixpath.join(index_dir, "cells"))
    )


def run_streaming_ivf(
    vectors: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = N_CELLS,
    refine_iters: int = 1,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start the upsert-aware IVF maintenance job on a vector stream; a
    re-delivered ``id_col`` replaces the vector (last writer wins)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        process_ivf_batch(
            batch,
            batch_id,
            index_dir=index_dir,
            id_col=id_col,
            vec_col=vec_col,
            n_cells=n_cells,
            refine_iters=refine_iters,
        )

    return (
        vectors.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def current_ivf_view(spark: SparkSession, index_dir: str) -> DataFrame:
    """The index's CURRENT vectors: (c_id, cell, c_vec) — each id's
    max-batch entry. The version lookup reads only the (c_id, batch_id)
    column projection (the upsert_dedup read-side discipline)."""
    store = spark.read.parquet(posixpath.join(index_dir, "cells"))
    latest = store.groupBy("c_id").agg(F.max("batch_id").alias("batch_id"))
    return store.join(latest, ["c_id", "batch_id"]).select(
        "c_id", "cell", "c_vec"
    )


def current_ivf_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int = N_PROBE,
    query_id_col: str = "q_id",
) -> DataFrame:
    """Top-k against the maintained index's current view: probe cells
    compute from the committed quantizer, the cell predicate prunes the
    store scan BEFORE the version join, exact cosine on the survivors;
    self-matches excluded (the ivf_probe_index contract)."""
    cents = load_stream_centroids(spark, index_dir)
    if cents is None:
        raise RuntimeError(f"no committed quantizer under {index_dir}")
    qv = as_double_array(F.col(vec_col))
    ranked = F.transform(
        F.sequence(F.lit(0), F.lit(len(cents) - 1)),
        lambda i: F.struct(
            F.element_at(F.col("scores"), i + 1).alias("s"), (-i).alias("negcell")
        ),
    )
    probes = (
        queries.select(
            F.col(id_col).alias(query_id_col),
            qv.alias("q_vec"),
            _cell_scores(qv, cents).alias("scores"),
        )
        .select(
            query_id_col,
            "q_vec",
            F.explode(
                F.slice(F.sort_array(ranked, asc=False), 1, n_probe).getField(
                    "negcell"
                )
            ).alias("negcell"),
        )
        .select(query_id_col, "q_vec", (-F.col("negcell")).alias("cell"))
    )
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    store = spark.read.parquet(posixpath.join(index_dir, "cells")).filter(
        F.col("cell").isin(cells)
    )
    # version filter AFTER the cell prune: the max-batch lookup still has
    # to be corpus-wide per id (an id's latest entry may sit in an
    # unprobed cell — then its probed-cell entry is stale and must lose)
    full = spark.read.parquet(posixpath.join(index_dir, "cells"))
    latest = full.groupBy("c_id").agg(F.max("batch_id").alias("batch_id"))
    live = store.join(latest, ["c_id", "batch_id"]).select(
        "c_id", "cell", "c_vec"
    )
    score = F.round(
        dot(F.col("q_vec"), F.col("c_vec"))
        / (norm(F.col("q_vec")) * norm(F.col("c_vec"))),
        SCORE_DECIMALS,
    )
    scored = (
        live.join(F.broadcast(probes), "cell")
        .filter(F.col(query_id_col) != F.col("c_id"))
        .select(query_id_col, "c_id", score.alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
