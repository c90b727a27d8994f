"""Advanced relational patterns: as-of join, pivot, geodesic track length.

The as-of join is the guide pattern Spark lacks natively — expressed as a
carry-forward window (single shuffle on the key, no join at all). The geo
track exercises the Haversine column expression (reference
WGS84SphereHaversinePointMetric) over a deterministic synthetic track.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.geo import haversine_m
from ..tables import load
from .catalog import query


# --- Q: as-of join (most recent view before each purchase) -------------------


@query(
    "q_asof_purchase_view",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_us
      FROM events
    )
    SELECT user_id, event_id AS purchase_id,
           (ts_us - prev_view_us) // 1000 AS wait_ms
    FROM ordered
    WHERE event_type = 'purchase' AND prev_view_us IS NOT NULL
    ORDER BY user_id, purchase_id
    """,
    bench=True,
    doc="As-of join: for each purchase, the most recent prior view of the "
    "same user — carry-forward window instead of a range join (no join, one "
    "shuffle on user_id).",
)
def q_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_view = F.last(F.when(F.col("event_type") == "view", F.col("ts_us")), ignorenulls=True).over(w)
    return (
        events.withColumn("prev_view_us", prev_view)
        .filter((F.col("event_type") == "purchase") & F.col("prev_view_us").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.expr("(ts_us - prev_view_us) div 1000").alias("wait_ms"),
        )
        .orderBy("user_id", "purchase_id")
    )


# --- Q: pivot (event-type counts per user) -----------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_events_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in EVENT_TYPES)},
           COUNT(*) AS total
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Pivot: per-user event-type count matrix (explicit value list keeps "
    "the plan a single aggregation, no second pass for value discovery).",
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t) for t in EVENT_TYPES
    ]
    return (
        events.groupBy("user_id")
        .agg(*aggs, F.count("*").alias("total"))
        .orderBy("user_id")
    )


# --- Q: geodesic track length (Haversine over consecutive points) ------------


@query(
    "q_geo_track_length",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_id, ts,
             ((user_id * 13 + event_id * 7) % 17000) / 100.0 - 85.0 AS lat,
             ((user_id * 31 + event_id * 3) % 36000) / 100.0 - 180.0 AS lon
      FROM events
    ),
    steps AS (
      SELECT user_id,
             LAG(lat) OVER w AS lat0, LAG(lon) OVER w AS lon0, lat, lon
      FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(lat0) AS n_steps,
           round(SUM(
             2 * 6371000.0 * asin(sqrt(
               sin(radians(lat - lat0) / 2) ^ 2
               + cos(radians(lat0)) * cos(radians(lat)) * sin(radians(lon - lon0) / 2) ^ 2
             ))
           ), 3) AS track_m
    FROM steps
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Haversine track length per user over a deterministic synthetic "
    "track — the spatial distance predicate as a pure column expression "
    "(reference WGS84SphereHaversinePointMetric; no UDF).",
)
def q_geo_track_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    pts = events.select(
        "user_id",
        "event_id",
        "ts",
        (((F.col("user_id") * 13 + F.col("event_id") * 7) % 17000) / 100.0 - 85.0).alias("lat"),
        (((F.col("user_id") * 31 + F.col("event_id") * 3) % 36000) / 100.0 - 180.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = pts.select(
        "user_id",
        F.lag("lat").over(w).alias("lat0"),
        F.lag("lon").over(w).alias("lon0"),
        "lat",
        "lon",
    )
    dist = haversine_m(F.col("lat0"), F.col("lon0"), F.col("lat"), F.col("lon"))
    return (
        steps.groupBy("user_id")
        .agg(
            F.count("lat0").alias("n_steps"),
            F.round(F.sum(dist), 3).alias("track_m"),
        )
        .orderBy("user_id")
    )


# --- rows-only catalog entries: per-group Python operators --------------------
# Stay-point clustering and trellis movement smoothing are order-dependent
# per-user dynamic programming (SURVEY.md §2.7) — not SQL-expressible, so
# these declare oracle=None and the driver records the weaker rows-only
# check the brief defines for custom stateful operators; golden-value
# coverage lives in pytest (tests/test_er_staypoints.py). Both consume a
# deterministic synthetic dwell-then-jump track derived from the events
# table: three dwell centers per user with meter-scale jitter, exactly the
# shape stay extraction exists to find.


def _synthetic_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    dwell = (F.col("event_id") % 3).cast("double")  # which center
    jitter = ((F.col("event_id") % 7).cast("double") - 3.0) * 1e-5  # ~1 m
    return events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.lit(2.30) + dwell * 0.05 + jitter).alias("lon"),
        (F.lit(48.80) + dwell * 0.05 + jitter).alias("lat"),
        F.lit(20.0).alias("accuracy_m"),
    )


@query(
    "q_staypoints",
    oracle=None,
    doc="Stay-point clustering (Hellinger-merged Gaussian clusters, "
    "λ=0.95, 15-min minimum stay) over per-user time-sorted tracks via "
    "applyInPandas — reference TimeSequentialClusterEstimator.scala:49-106; "
    "rows-only driver check, golden values in pytest.",
)
def q_staypoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staypoints import extract_stays

    return extract_stays(_synthetic_track(spark, sf_dir)).orderBy(
        "user_id", "start_us"
    )


@query(
    "q_movement_smoothing",
    oracle=None,
    doc="Movement/stay trellis smoothing (Viterbi min-cost state path per "
    "user — reference StateEstimator.scala:19-96) via applyInPandas; "
    "rows-only driver check, golden values in pytest.",
)
def q_movement_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.movement import segment_movement

    return segment_movement(_synthetic_track(spark, sf_dir)).orderBy(
        "user_id", "start_us"
    )


@query(
    "q_multimodal_features",
    oracle=None,
    doc="Multimodal column plumbing: binary media content → Arrow-batched "
    "mapInPandas feature extraction (dimensions, mean luma, perceptual "
    "hash). The codec is the documented deterministic fake (no image "
    "library in this runtime); schema, batching, and hash math are the "
    "real production path. Rows-only driver check.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.ops import extract_image_features

    docs = load(spark, sf_dir, "documents").limit(200)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return extract_image_features(media, fake_decode=True).orderBy("media_id")
