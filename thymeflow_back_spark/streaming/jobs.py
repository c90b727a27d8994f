"""Structured Streaming jobs: the continuous form of the pipeline.

The reference's Akka-Streams dataflow (SURVEY.md §3.2) maps to Structured
Streaming: a quad-staging directory is the source (synchronizers append
parquet batches), foreachBatch drives the enrichment pipeline, and the
trigger interval plays the DelayedBatch debounce role (reference
DelayedBatch.scala: fold diffs, emit after a quiet period — here: every
micro-batch folds whatever arrived during the trigger interval).

Watermark-windowed aggregation is included for the event-stream analytics
(late data bounded by the watermark; reference handles late redelivery by
idempotent graph replacement, which ingest_quads preserves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..enrichers.pipeline import EnrichmentPipeline
from ..rdf.model import QUAD_SCHEMA


def quad_stream(spark: SparkSession, staging_dir: str) -> DataFrame:
    """Stream of quads from a staging directory of parquet files."""
    return spark.readStream.schema(QUAD_SCHEMA).parquet(staging_dir)


def run_pipeline_stream(
    pipeline: EnrichmentPipeline,
    quads: DataFrame,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Drive the enrichment pipeline from a quad stream via foreachBatch.

    ``trigger``: e.g. {"processingTime": "10 seconds"} (the debounce delay),
    or {"availableNow": True} for drain-and-stop (testing/backfill).
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        pipeline.ingest_quads(batch.localCheckpoint(eager=True))

    writer = quads.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"processingTime": "10 seconds"}))
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (streaming form of
    q_event_histogram; late rows beyond the watermark are dropped)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
