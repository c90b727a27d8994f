"""Upsert-aware incremental near-dup: document re-delivery replaces state.

The append-only job (dedup_stream.py) assumes immutable documents; real
ingestion RE-DELIVERS them (the reference's core contract — a Document
re-delivery REPLACES its named graph, Pipeline.scala:61-93). This job
extends the persistent-band-index design with last-writer-wins versioning:

- every index entry (band row, shingle row) carries its ``batch_id`` —
  a document's CURRENT version is its max batch in the docs store, so no
  separate version log exists (the id+batch projection of the store IS
  the version relation),
- per batch, within-batch pairs come from the exact blocked join as
  before; cross-batch candidates join the new bands against prior band
  entries EXCLUDING (a) ids re-delivered in THIS batch (their old bands
  are stale and their new text already rides the within-batch join) and
  (b) entries superseded by a later re-delivery (entry batch != the
  id's latest batch — checked against the candidate-bounded version
  lookup, a broadcast-semi-joined scan of the id+batch columns only),
- emitted pairs carry BOTH endpoints' versions (a_ver, b_ver). Nothing
  is ever retracted from the pairs log — supersession happens AT READ:
  :func:`current_near_dups` keeps a pair iff both endpoints' emit
  versions are still their latest versions. An update to either
  endpoint silently invalidates the old pairs, and the update's own
  batch re-emits whatever still matches (its new bands joined the whole
  surviving corpus), so the CURRENT view always equals batch dedup over
  the corpus of latest versions (within-batch exact + cross-batch LSH
  recall, the q_streaming_near_dup contract).

Per-batch cost stays incremental: the batch's own shingle/band passes,
one band-bucket join against the index, and a version lookup bounded by
the candidate set; the only full-store read is the two-column id+batch
projection inside the read-side view.

Write discipline is dedup_stream's: every sink partitioned by batch_id
with dynamic overwrite, so a retried batch rewrites its own partitions.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    doc_shingles,
    jaccard_near_dups,
    jaccard_verify_pairs,
    lsh_band_rows,
    minhash_signatures_mapside,
)
from .dedup_stream import _foreign_batch_ids


def run_upsert_near_dup(
    docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start the upsert-aware near-dup job on a document stream; a
    re-delivered ``id_col`` replaces the document (last writer wins)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        process_upsert_batch(
            batch,
            batch_id,
            index_dir=index_dir,
            pairs_dir=pairs_dir,
            id_col=id_col,
            text_col=text_col,
            n=n,
            threshold=threshold,
        )

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def process_upsert_batch(
    batch: DataFrame,
    batch_id: int,
    *,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> None:
    bands_dir = posixpath.join(index_dir, "bands")
    docs_dir = posixpath.join(index_dir, "docs")
    if batch.isEmpty():
        return
    spark = batch.sparkSession
    prev = _foreign_batch_ids(spark, docs_dir, batch_id)
    bands_prev = _foreign_batch_ids(spark, bands_dir, batch_id)
    if bands_prev != prev:
        raise RuntimeError(
            f"upsert near-dup index at {index_dir} is incomplete: bands "
            f"has batches {sorted(bands_prev)} but docs has "
            f"{sorted(prev)} (interrupted write?)"
        )
    if any(b < 0 for b in prev):
        # compact_index folds every partition to batch_id=-1, which
        # destroys the version information this job's liveness checks and
        # read-side supersession depend on — refuse loudly instead of
        # silently emptying the current view / reviving stale entries
        raise RuntimeError(
            f"upsert near-dup index at {index_dir} contains compacted "
            "(batch_id=-1) partitions; compact_index is the APPEND-ONLY "
            "job's maintenance op and is incompatible with a versioned "
            "upsert index"
        )

    # deterministic within-batch last-writer: at most one row per id
    # (double delivery inside one micro-batch has no order, so collapse
    # by max(text) — any pure function works as long as both engines
    # and every retry agree)
    batch = (
        batch.groupBy(F.col(id_col))
        .agg(F.max(text_col).alias(text_col))
        .localCheckpoint(eager=True)
    )
    docs_sh = doc_shingles(batch, id_col, text_col, n).localCheckpoint(
        eager=True
    )
    bands = lsh_band_rows(
        minhash_signatures_mapside(docs_sh, id_col), id_col
    ).localCheckpoint(eager=True)

    pairs = jaccard_near_dups(
        batch, id_col, text_col, n, threshold, shingles=docs_sh
    ).select(
        "a_id",
        "b_id",
        "n_common",
        "jaccard",
        F.lit(batch_id).alias("a_ver"),
        F.lit(batch_id).alias("b_ver"),
    )

    if prev:
        def read_prev(root: str) -> DataFrame:
            paths = [
                posixpath.join(root, f"batch_id={b}") for b in sorted(prev)
            ]
            return spark.read.option("basePath", root).parquet(*paths)

        cur_ids = batch.select(F.col(id_col).alias("a_id"))
        old_bands = (
            read_prev(bands_dir)
            .withColumnRenamed(id_col, "a_id")
            # (a) re-delivered THIS batch: old bands stale, new text
            # already joined within-batch
            .join(F.broadcast(cur_ids), "a_id", "left_anti")
        )
        cands = (
            old_bands.join(
                bands.withColumnRenamed(id_col, "b_id"), ["band", "bkey"]
            )
            .select("a_id", F.col("batch_id").alias("entry_ver"), "b_id")
            .dropDuplicates(["a_id", "entry_ver", "b_id"])
        )
        # (b) candidate-bounded version lookup: an id's latest batch over
        # the docs store's id+batch projection (columns only — the scan
        # prunes to two columns; the semi join bounds the aggregate to
        # candidate ids)
        old_docs = read_prev(docs_dir)
        latest = (
            old_docs.select(F.col(id_col).alias("a_id"), "batch_id")
            .join(
                F.broadcast(cands.select("a_id").distinct()), "a_id"
            )
            .groupBy("a_id")
            .agg(F.max("batch_id").alias("a_ver"))
        )
        live = cands.join(latest, "a_id").filter(
            F.col("entry_ver") == F.col("a_ver")
        )
        verified = jaccard_verify_pairs(
            live.join(
                old_docs.select(
                    F.col(id_col).alias("a_id"),
                    F.col("sh").alias("a_sh"),
                    F.col("batch_id").alias("a_ver2"),
                ),
                "a_id",
            )
            .filter(F.col("a_ver2") == F.col("a_ver"))
            .join(
                docs_sh.select(
                    F.col(id_col).alias("b_id"), F.col("sh").alias("b_sh")
                ),
                "b_id",
            )
            .select("a_id", "b_id", "a_sh", "b_sh", "a_ver"),
            threshold,
            carry=("a_ver",),  # rides through the verify — no join-back
        ).select(
            "a_id",
            "b_id",
            "n_common",
            "jaccard",
            "a_ver",
            F.lit(batch_id).alias("b_ver"),
        )
        pairs = pairs.unionByName(verified)

    def write(df: DataFrame, path: str, *extra_parts: str) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.partitionBy("batch_id", *extra_parts)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )

    write(bands, bands_dir, "band")
    write(docs_sh, docs_dir)
    write(pairs, pairs_dir)


def current_near_dups(
    spark: SparkSession,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """The CURRENT pair view: emitted pairs whose endpoints are both still
    at their emit-time versions. One id+batch projection of the docs
    store derives the version relation; stale pairs vanish without any
    retraction write."""
    docs_dir = posixpath.join(index_dir, "docs")
    store = spark.read.parquet(docs_dir)
    # a compacted (batch_id=-1) store has lost its version information —
    # latest would collapse to -1 and every stored pair would be dropped
    if store.filter(F.col("batch_id") < 0).take(1):
        raise RuntimeError(
            f"upsert near-dup index at {index_dir} contains compacted "
            "partitions; the versioned view cannot be derived"
        )
    latest = (
        store.groupBy(F.col(id_col).alias("id"))
        .agg(F.max("batch_id").alias("latest"))
    )
    pairs = spark.read.parquet(pairs_dir).drop("batch_id")
    la = latest.select(F.col("id").alias("a_id"), F.col("latest").alias("la"))
    lb = latest.select(F.col("id").alias("b_id"), F.col("latest").alias("lb"))
    # cross-batch pairs put the OLD document on the a side, so an update
    # can re-emit a pair with flipped orientation — normalize to a < b
    return (
        pairs.join(la, "a_id")
        .join(lb, "b_id")
        .filter((F.col("a_ver") == F.col("la")) & (F.col("b_ver") == F.col("lb")))
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            "n_common",
            "jaccard",
        )
        .dropDuplicates(["a_id", "b_id"])
    )
