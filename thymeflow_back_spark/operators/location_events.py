"""Event × stay location matching: interval overlap + overlap-ratio +
distance predicate.

Parity with reference LocationEventEnricher.scala:66-95: an event is
located at a stay when

- their [start, end] intervals overlap,
- the shared interval is STRICTLY more than ``overlap_min_ratio`` (default
  0.2) of the EVENT's length, and
- if both sides carry coordinates, their Haversine distance is at most
  ``max_distance_m`` (default 1 km); a side without coordinates passes
  (the reference's Option.forall semantics).

The reference does this with an in-heap O(events × stays) double loop
(events.toBuffer); here it is the bucketized interval equi-join
(operators/interval_join.py) — hash-partitioned shuffle bounded by bucket
width, exact predicates applied after the join, so the plan survives a
100× scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_m
from .interval_join import interval_overlap_join


def match_events_to_stays(
    events: DataFrame,
    stays: DataFrame,
    on: Sequence[str] = (),
    overlap_min_ratio: float = 0.2,
    max_distance_m: float = 1000.0,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Match events to stays (LocationEventEnricher semantics).

    ``events``: event_id, event_start_us, event_end_us, event_lat, event_lon
    (coordinates nullable). ``stays``: stay_id, stay_start_us, stay_end_us,
    stay_lat, stay_lon (nullable). Returns one row per (event, stay) match
    with the interval columns and overlap_us.
    """
    pairs = interval_overlap_join(
        events,
        stays,
        on=on,
        left_start="event_start_us",
        left_end="event_end_us",
        right_start="stay_start_us",
        right_end="stay_end_us",
        bucket_seconds=bucket_seconds,
        dedup_cols=[*on, "event_id", "stay_id"],
    )
    overlap = F.least(F.col("event_end_us"), F.col("stay_end_us")) - F.greatest(
        F.col("event_start_us"), F.col("stay_start_us")
    )
    event_len = F.col("event_end_us") - F.col("event_start_us")
    distance_ok = (
        F.col("event_lat").isNull()
        | F.col("stay_lat").isNull()
        | (
            haversine_m(
                F.col("event_lat"), F.col("event_lon"), F.col("stay_lat"), F.col("stay_lon")
            )
            <= F.lit(max_distance_m)
        )
    )
    return (
        pairs.filter(overlap.cast("double") / event_len.cast("double") > F.lit(overlap_min_ratio))
        .filter(distance_ok)
        .withColumn("overlap_us", overlap)
    )
