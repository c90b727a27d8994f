"""Structured Streaming jobs: the continuous form of the pipeline.

The reference's Akka-Streams dataflow (SURVEY.md §3.2) maps to Structured
Streaming: a quad-staging directory is the source (synchronizers append
parquet batches), foreachBatch drives the enrichment pipeline, and
``debounce_quads`` is the DelayedBatch stage (reference
DelayedBatch.scala:16-100: fold incoming elements, emit only once a QUIET
PERIOD passes with nothing new). Here the debounce is keyed by document
graph and runs as ``applyInPandasWithState`` with a processing-time
timeout — a graph that keeps receiving quads keeps folding and resetting
its timer; the folded document is released to the enrichment pipeline only
when its source goes quiet, exactly the reference's batching contract, but
distributed per key instead of a single in-process stage.

Watermark-windowed aggregation is included for the event-stream analytics
(late data bounded by the watermark; reference handles late redelivery by
idempotent graph replacement, which ingest_quads preserves).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..enrichers.pipeline import EnrichmentPipeline
from ..rdf.model import QUAD_COLUMNS, QUAD_SCHEMA


def quad_stream(spark: SparkSession, staging_dir: str) -> DataFrame:
    """Stream of quads from a staging directory of parquet files."""
    return spark.readStream.schema(QUAD_SCHEMA).parquet(staging_dir)


def run_pipeline_stream(
    pipeline: EnrichmentPipeline,
    quads: DataFrame,
    checkpoint_dir: str,
    trigger: dict | None = None,
    debounce_ms: int | None = None,
) -> StreamingQuery:
    """Drive the enrichment pipeline from a quad stream via foreachBatch.

    ``trigger``: e.g. {"processingTime": "10 seconds"} (the debounce delay),
    or {"availableNow": True} for drain-and-stop (testing/backfill).
    ``debounce_ms``: when set, insert the per-graph quiet-period
    ``debounce_quads`` stage before the pipeline — a document graph's quads
    fold in keyed state and reach the enrichers only once its source stays
    quiet for that long (the reference's DelayedBatch placement between the
    geocoder and the location enrichers, Thymeflow.scala:58).
    """
    if debounce_ms is not None:
        quads = debounce_quads(quads, quiet_period_ms=debounce_ms)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        pipeline.ingest_quads(batch.localCheckpoint(eager=True))

    writer = quads.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"processingTime": "10 seconds"}))
    return writer.start()


def debounce_quads(quads: DataFrame, quiet_period_ms: int = 10_000) -> DataFrame:
    """DelayedBatch: per-graph quiet-period debounce over a quad stream.

    Each document graph folds its incoming quads into keyed state; every
    new arrival resets the graph's processing-time timeout. Only when
    ``quiet_period_ms`` elapses with NO new quads for that graph does the
    folded batch emit downstream (reference DelayedBatch.scala: emit when
    `delay` has passed since the last element). Emission is per-graph, so
    a chatty mailbox folding thousands of updates doesn't hold back an
    already-quiet calendar document.
    """

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (rows_json,) = state.get
            state.remove()
            rows = [json.loads(r) for r in rows_json]
            yield pd.DataFrame(rows, columns=list(QUAD_COLUMNS))
        else:
            rows_json = list(state.get[0]) if state.exists else []
            for pdf in pdfs:
                for row in pdf[list(QUAD_COLUMNS)].itertuples(index=False):
                    rows_json.append(json.dumps(list(row)))
            state.update((rows_json,))
            state.setTimeoutDuration(quiet_period_ms)
            yield pd.DataFrame(columns=list(QUAD_COLUMNS))

    return quads.groupBy("graph").applyInPandasWithState(
        fold,
        outputStructType=QUAD_SCHEMA,
        stateStructType="rows array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_stays(
    locations: DataFrame,
    quiet_period_ms: int = 60_000,
    min_stay_us: int | None = None,
    window_us: int | None = None,
    lam: float | None = None,
) -> DataFrame:
    """Stay-point extraction as a stateful stream (the continuous form of
    operators/staypoints.py — the reference runs the same estimator inside
    its Akka pipeline, LocationStayEnricher over the incremental diff).

    Keyed by user via ``applyInPandasWithState``: each micro-batch appends
    the user's new observations to the buffered open tail, re-runs the
    time-sequential fold, EMITS only clusters that are definitively closed
    (a later observation broke them), and keeps the open cluster in state —
    so results are append-only and identical to the batch operator over the
    same prefix. A user gone quiet for ``quiet_period_ms`` flushes the open
    cluster via the processing-time timeout (the DelayedBatch discipline).

    Late data bounded like a watermark: rows older than the open tail fold
    into it; rows older than an already-emitted stay cannot revise it.
    """
    from ..algorithms import staypoints as algo

    kw = {}
    if min_stay_us is not None:
        kw["min_stay_us"] = min_stay_us
    if window_us is not None:
        kw["window_us"] = window_us
    if lam is not None:
        kw["lam"] = lam

    import numpy as np

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        cols = ["user_id", "start_us", "end_us", "lon", "lat", "n_obs"]

        def stays_frame(stays):
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(stays),
                    "start_us": [s.start_us for s in stays],
                    "end_us": [s.end_us for s in stays],
                    "lon": [s.lon for s in stays],
                    "lat": [s.lat for s in stays],
                    "n_obs": [s.n_obs for s in stays],
                },
                columns=cols,
            )

        if state.hasTimedOut:
            t, lon, lat, acc = state.get
            state.remove()
            stays = algo.extract_stays(
                np.asarray(t, dtype=np.int64),
                np.asarray(lon, dtype=float),
                np.asarray(lat, dtype=float),
                np.asarray(acc, dtype=float),
                **kw,
            )
            yield stays_frame(stays)
            return
        prev = state.get if state.exists else ([], [], [], [])
        frames = [
            pd.DataFrame(
                {"ts_us": prev[0], "lon": prev[1], "lat": prev[2], "accuracy_m": prev[3]}
            )
        ] + [pdf[["ts_us", "lon", "lat", "accuracy_m"]] for pdf in pdfs]
        track = (
            pd.concat(frames, ignore_index=True)
            .sort_values(["ts_us", "lon", "lat"])
            .reset_index(drop=True)
        )
        stays, open_start = algo.extract_stays(
            track["ts_us"].to_numpy(dtype=np.int64),
            track["lon"].to_numpy(dtype=float),
            track["lat"].to_numpy(dtype=float),
            track["accuracy_m"].to_numpy(dtype=float),
            flush_tail=False,
            **kw,
        )
        tail = track.iloc[open_start:]
        state.update(
            (
                [int(x) for x in tail["ts_us"]],
                [float(x) for x in tail["lon"]],
                [float(x) for x in tail["lat"]],
                [float(x) for x in tail["accuracy_m"]],
            )
        )
        state.setTimeoutDuration(quiet_period_ms)
        yield stays_frame(stays)

    return locations.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=(
            "user_id long, start_us long, end_us long, lon double, lat double, n_obs int"
        ),
        stateStructType=(
            "ts_us array<long>, lon array<double>, lat array<double>, acc array<double>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


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
