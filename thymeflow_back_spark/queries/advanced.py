"""Advanced relational patterns: as-of join, pivot, geodesic track length.

The as-of join is the guide pattern Spark lacks natively — expressed as a
carry-forward window (single shuffle on the key, no join at all). The geo
track exercises the Haversine column expression (reference
WGS84SphereHaversinePointMetric) over a deterministic synthetic track.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
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


# --- per-group Python operators (recursive-CTE oracles) -----------------------
# Stay-point clustering and trellis movement smoothing are order-dependent
# per-user dynamic programming (SURVEY.md §2.7). Since round 3 both carry
# FULL DuckDB oracles anyway — recursive CTEs replay the sequential fold /
# Viterbi recurrence in fixed IEEE order, so the driver hash-matches their
# values like any SQL query; golden-value coverage also lives in pytest
# (tests/test_er_staypoints.py). Both consume a
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
    oracle="""
    WITH RECURSIVE raw AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             2.30 + (event_id % 3) * 0.05 + ((event_id % 7) - 3) * 1e-5 AS lon,
             48.80 + (event_id % 3) * 0.05 + ((event_id % 7) - 3) * 1e-5 AS lat
      FROM events
    ),
    proj AS (
      SELECT user_id, ts_us, lon, lat,
             lon * 111320.0 * cos(radians(median(lat) OVER (PARTITION BY user_id))) AS x,
             lat * 111320.0 AS y
      FROM raw
    ),
    obs AS (
      SELECT user_id, ts_us, x, y,
             row_number() OVER (PARTITION BY user_id ORDER BY ts_us, lon, lat) AS i
      FROM proj
    ),
    counts AS (SELECT user_id, COUNT(*) AS n FROM obs GROUP BY user_id),
    -- per-user sequential fold (TimeSequentialClusterEstimator semantics):
    -- state = full member list + emitted stays; each step window-filters the
    -- members, tests the observation's Hellinger distance against the
    -- running Gaussian, and either merges or flushes
    walk(user_id, i, mem, stays) AS (
      SELECT user_id, 1,
             [{'ts': ts_us, 'x': x, 'y': y}],
             CAST([] AS STRUCT(s BIGINT, e BIGINT, n INTEGER)[])
      FROM obs WHERE i = 1
      UNION ALL
      SELECT user_id, i,
             CASE WHEN ok THEN list_append(mem, obs_s) ELSE [obs_s] END,
             CASE WHEN ok THEN stays
                  WHEN mem[-1].ts - mem[1].ts >= 900000000
                    THEN list_append(stays, {'s': mem[1].ts, 'e': mem[-1].ts,
                                             'n': CAST(len(mem) AS INTEGER)})
                  ELSE stays END
      FROM (
        SELECT *,
               (len(recent) > 0 AND sqrt(greatest(0.0,
                  1.0 - (2 * s1 * 20.0 / (s1 * s1 + 400.0))
                      * exp(-((obs_s.x - mux) * (obs_s.x - mux)
                            + (obs_s.y - muy) * (obs_s.y - muy))
                            / (4 * (s1 * s1 + 400.0))))) <= 0.95) AS ok
        FROM (
          SELECT *,
                 greatest(sqrt(list_aggregate(
                   [(m.x - mux) * (m.x - mux) + (m.y - muy) * (m.y - muy)
                    FOR m IN recent], 'avg')), 20.0) AS s1
          FROM (
            SELECT *,
                   list_aggregate([m.x FOR m IN recent], 'avg') AS mux,
                   list_aggregate([m.y FOR m IN recent], 'avg') AS muy
            FROM (
              SELECT w.user_id, w.i + 1 AS i, w.mem AS mem, w.stays AS stays,
                     {'ts': o.ts_us, 'x': o.x, 'y': o.y} AS obs_s,
                     [m FOR m IN w.mem IF o.ts_us - m.ts <= 3600000000] AS recent
              FROM walk w
              JOIN obs o ON o.user_id = w.user_id AND o.i = w.i + 1
            )
          )
        )
      )
    ),
    final AS (
      SELECT w.user_id,
             CASE WHEN w.mem[-1].ts - w.mem[1].ts >= 900000000
                  THEN list_append(w.stays, {'s': w.mem[1].ts, 'e': w.mem[-1].ts,
                                             'n': CAST(len(w.mem) AS INTEGER)})
                  ELSE w.stays END AS stays
      FROM walk w JOIN counts c ON c.user_id = w.user_id AND w.i = c.n
    ),
    flat AS (SELECT user_id, unnest(stays) AS st FROM final)
    SELECT user_id, st.s AS start_us, st.e AS end_us, st.n AS n_obs
    FROM flat ORDER BY user_id, start_us
    """,
    doc="Stay-point clustering (Hellinger-merged Gaussian clusters, "
    "λ=0.95, 15-min minimum stay, 60-min lookback) over per-user "
    "time-sorted tracks via applyInPandas — reference "
    "TimeSequentialClusterEstimator.scala:49-106. The oracle replays the "
    "same per-user sequential fold as a DuckDB recursive CTE carrying the "
    "member list as state; output is the integer cluster structure "
    "(bounds + size) so the hash compare is float-robust — centroid "
    "golden values live in pytest (tests/test_er_staypoints.py).",
)
def q_staypoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.staypoints import extract_stays

    return (
        extract_stays(_synthetic_track(spark, sf_dir))
        .select("user_id", "start_us", "end_us", "n_obs")
        .orderBy("user_id", "start_us")
    )


@query(
    "q_movement_smoothing",
    oracle="""
    WITH RECURSIVE raw AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             2.30 + (event_id % 3) * 0.05 + ((event_id % 7) - 3) * 1e-5 AS lon,
             48.80 + (event_id % 3) * 0.05 + ((event_id % 7) - 3) * 1e-5 AS lat
      FROM events
    ),
    proj AS (
      SELECT user_id, ts_us, lon, lat,
             lon * 111320.0 * cos(radians(median(lat) OVER (PARTITION BY user_id))) AS x,
             lat * 111320.0 AS y
      FROM raw
    ),
    pts AS (
      SELECT user_id, ts_us, x, y,
             row_number() OVER (PARTITION BY user_id ORDER BY ts_us, lon, lat) AS i
      FROM proj
    ),
    counts AS (SELECT user_id, COUNT(*) AS n FROM pts GROUP BY user_id),
    gaps AS (
      SELECT p2.user_id AS user_id, p1.i AS g,
             sqrt((p2.x - p1.x) * (p2.x - p1.x) + (p2.y - p1.y) * (p2.y - p1.y))
               / greatest((p2.ts_us - p1.ts_us) / 1e6, 1e-3) AS speed
      FROM pts p1 JOIN pts p2 ON p2.user_id = p1.user_id AND p2.i = p1.i + 1
    ),
    -- 2-state Viterbi forward pass carrying (cost, best path) per end state;
    -- emissions mirror algorithms/trellis.py: stationary 0.1 + capped
    -- quadratic over still_speed 1.5, moving 0.6 + capped low-speed penalty,
    -- switch cost 2.0; ties prefer STATIONARY (first state examined)
    walk(user_id, g, cost_s, cost_m, path_s, path_m) AS (
      SELECT user_id, 1,
             0.1 + least(4.0, greatest(0.0, speed - 1.5) ** 2 / 8.0),
             0.6 + least(4.0, 1.5 * greatest(0.0, 1.5 - speed) ** 2),
             [0], [1]
      FROM gaps WHERE g = 1
      UNION ALL
      SELECT user_id, g,
             least(cost_s, cost_m + 2.0)
               + 0.1 + least(4.0, greatest(0.0, speed - 1.5) ** 2 / 8.0),
             least(cost_s + 2.0, cost_m)
               + 0.6 + least(4.0, 1.5 * greatest(0.0, 1.5 - speed) ** 2),
             CASE WHEN cost_m + 2.0 < cost_s
                  THEN list_append(path_m, 0) ELSE list_append(path_s, 0) END,
             CASE WHEN cost_m < cost_s + 2.0
                  THEN list_append(path_m, 1) ELSE list_append(path_s, 1) END
      FROM (
        SELECT w.user_id, o.g, w.cost_s, w.cost_m, w.path_s, w.path_m, o.speed
        FROM walk w JOIN gaps o ON o.user_id = w.user_id AND o.g = w.g + 1
      )
    ),
    fin AS (
      SELECT w.user_id,
             CASE WHEN w.cost_m < w.cost_s THEN w.path_m ELSE w.path_s END AS states
      FROM walk w JOIN counts c ON c.user_id = w.user_id AND w.g = c.n - 1
    ),
    st AS (
      SELECT user_id, u.st AS state, u.i AS idx
      FROM (
        SELECT user_id,
               unnest([{'st': states[i], 'i': i}
                       FOR i IN generate_series(1, len(states))]) AS u
        FROM fin
      )
    ),
    marked AS (
      SELECT user_id, state, idx,
             CASE WHEN LAG(state) OVER (PARTITION BY user_id ORDER BY idx)
                       IS DISTINCT FROM state THEN 1 ELSE 0 END AS brk
      FROM st
    ),
    seg AS (
      SELECT user_id, state, idx,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY idx) AS seg_id
      FROM marked
    ),
    bounds AS (
      SELECT user_id, MIN(state) AS state_i, MIN(idx) AS g_start,
             MAX(idx) AS g_end, COUNT(*) AS n_gaps
      FROM seg GROUP BY user_id, seg_id
    )
    SELECT b.user_id AS user_id,
           CASE WHEN b.state_i = 0 THEN 'stationary' ELSE 'moving' END AS state,
           p1.ts_us AS start_us, p2.ts_us AS end_us,
           CAST(b.n_gaps + 1 AS INTEGER) AS n_points
    FROM bounds b
    JOIN pts p1 ON p1.user_id = b.user_id AND p1.i = b.g_start
    JOIN pts p2 ON p2.user_id = b.user_id AND p2.i = b.g_end + 1
    ORDER BY b.user_id, start_us
    """,
    doc="Movement/stay trellis smoothing (Viterbi min-cost state path per "
    "user — reference StateEstimator.scala:19-96) via applyInPandas. The "
    "oracle replays the 2-state Viterbi as a DuckDB recursive CTE carrying "
    "(cost, best-path) per end state, then segments the decoded states "
    "with a gaps-and-islands pass; output is the integer segment "
    "structure (bounds, size, state label) so the hash compare is "
    "float-robust — mean-speed goldens live in pytest.",
)
def q_movement_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.movement import segment_movement

    return (
        segment_movement(_synthetic_track(spark, sf_dir))
        .select("user_id", "state", "start_us", "end_us", "n_points")
        .orderBy("user_id", "start_us")
    )


_HEXB = (
    "(strpos('0123456789abcdef', substr(h,{o1},1))-1)*16 "
    "+ (strpos('0123456789abcdef', substr(h,{o2},1))-1)"
)


def _hexbyte(i: int) -> str:
    """DuckDB expression for byte ``i`` (0-indexed) of hex digest ``h``."""
    return _HEXB.format(o1=2 * i + 1, o2=2 * i + 2)


@query(
    "q_multimodal_features",
    oracle=f"""
    WITH sel AS (
      SELECT doc_id, sha256(COALESCE(text, '')) AS h
      FROM documents ORDER BY doc_id LIMIT 200
    ),
    b AS (
      SELECT doc_id,
             {_hexbyte(0)} AS b0, {_hexbyte(1)} AS b1,
             {_hexbyte(2)} AS b2, {_hexbyte(3)} AS b3, {_hexbyte(4)} AS b4
      FROM sel
    )
    SELECT doc_id AS media_id,
           CAST(16 + b1 % 17 AS INTEGER) AS width,
           CAST(16 + b0 % 17 AS INTEGER) AS height,
           CAST(b2 + b3 + b4 AS DOUBLE) / 3 AS mean_luma,
           '0000000000000000' AS phash
    FROM b ORDER BY media_id
    """,
    doc="Multimodal column plumbing on REAL encoded bytes: each document's "
    "text is rendered to a solid-color RGB image whose (height, width, "
    "fill) derive from sha256(text) bytes, PNG-encoded, and the feature "
    "extractor (Arrow-batched mapInPandas) decodes it back with the "
    "pure-stdlib PNG codec (zlib inflate + numpy filter reconstruction, "
    "multimodal/png.py) before computing dimensions, mean luma, and a "
    "perceptual hash. Because the fill is solid, DuckDB re-derives every "
    "feature from sha256() alone — dimensions and EXACT mean luma "
    "((r+g+b)/3 is correctly-rounded IEEE division of the same rational "
    "on both engines), and the phash of a constant image is all-zero — "
    "so the real decode path is value-hash-checked end to end. "
    "Codec round-trip goldens on arbitrary images live in pytest.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from ..multimodal.ops import extract_image_features
    from ..multimodal.png import encode_png

    @pandas_udf("binary")
    def to_png(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            digest = hashlib.sha256((t or "").encode()).digest()
            h = 16 + digest[0] % 17
            w = 16 + digest[1] % 17
            fill = np.frombuffer(digest[2:5], dtype=np.uint8)
            out.append(encode_png(np.ascontiguousarray(np.broadcast_to(fill, (h, w, 3)))))
        return pd.Series(out)

    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        to_png(F.col("text")).alias("content"),
    )
    return extract_image_features(media).orderBy("media_id")


# --- Q: multimodal audio features (REAL WAV decode, sha256-derived oracle) ----


@query(
    "q_multimodal_audio",
    oracle=f"""
    WITH sel AS (
      SELECT doc_id, sha256(COALESCE(text, '')) AS h
      FROM documents ORDER BY doc_id LIMIT 200
    ),
    par AS (
      SELECT doc_id, h, {_hexbyte(0)} AS b0, {_hexbyte(1)} AS b1 FROM sel
    ),
    bytes AS (
      SELECT doc_id, ('0x' || substr(h, i * 2 + 1, 2))::BIGINT AS b
      FROM par, LATERAL (SELECT unnest(generate_series(0, 31)) AS i) s
    ),
    agg AS (
      SELECT doc_id,
             SUM(((b - 128) * 256) * ((b - 128) * 256)) AS sumsq,
             MAX(ABS((b - 128) * 256)) AS peak
      FROM bytes GROUP BY 1
    )
    SELECT p.doc_id AS media_id,
           CAST(8000 + (b0 % 8) * 1000 AS INTEGER) AS sample_rate,
           CAST(32 * (1 + b1 % 8) AS BIGINT) AS n_samples,
           CAST(32 * (1 + b1 % 8) AS DOUBLE) / (8000 + (b0 % 8) * 1000) * 1000
             AS duration_ms,
           sqrt(CAST((1 + b1 % 8) * a.sumsq AS DOUBLE) / (32 * (1 + b1 % 8))) AS rms,
           CAST(a.peak AS INTEGER) AS peak
    FROM par p JOIN agg a USING (doc_id) ORDER BY media_id
    """,
    doc="Multimodal AUDIO plumbing on REAL encoded bytes: each document's "
    "text becomes a 16-bit mono PCM WAV whose sample rate, tile count, and "
    "samples derive from sha256(text) bytes; the extractor (Arrow-batched "
    "mapInPandas) parses the RIFF container back with the stdlib wave "
    "module (multimodal/audio.py) and computes rate/length/duration/"
    "RMS/peak. Because the samples are a deterministic tile of the 32 "
    "digest bytes, DuckDB re-derives every feature — including the exact "
    "float64 RMS — from sha256() alone, value-checking the real decode "
    "path end to end.",
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from ..multimodal.audio import encode_wav, extract_audio_features

    @pandas_udf("binary")
    def to_wav(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            digest = hashlib.sha256((t or "").encode()).digest()
            sr = 8000 + (digest[0] % 8) * 1000
            tiles = 1 + digest[1] % 8
            base = (np.frombuffer(digest, dtype=np.uint8).astype(np.int32) - 128) * 256
            out.append(encode_wav(np.tile(base, tiles).astype(np.int16), sr))
        return pd.Series(out)

    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        to_wav(F.col("text")).alias("content"),
    )
    return extract_audio_features(media).orderBy("media_id")


# --- Q: grid-blocked spatial pair join ---------------------------------------

SPATIAL_RADIUS_M = 40.0
SPATIAL_REF_LAT = 48.1  # center of the synthetic 48.0-48.2 latitude band
# lon->meters scale computed ONCE in Python and embedded as the same literal
# in both engines, so cell ids are bit-identical
_XSCALE = repr(111320.0 * math.cos(math.radians(SPATIAL_REF_LAT)))
_CELL = repr(2.0 * SPATIAL_RADIUS_M)


@query(
    "q_spatial_pairs",
    oracle=f"""
    WITH pts AS (
      SELECT event_id AS pid,
             48.0 + (('0x' || substr(md5('lat' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 20000) / 100000.0 AS lat,
             2.0 + (('0x' || substr(md5('lon' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 30000) / 100000.0 AS lon
      FROM events
    ),
    cells AS (
      SELECT pid, lat, lon,
             floor(lon * {_XSCALE} / {_CELL}) AS cx,
             floor(lat * 110574.0 / {_CELL}) AS cy
      FROM pts
    ),
    reps AS (
      SELECT pid AS b_id, lat AS b_lat, lon AS b_lon,
             cx + dx.g AS cx, cy + dy.g AS cy
      FROM cells,
           (SELECT unnest(generate_series(-1, 1)) AS g) dx,
           (SELECT unnest(generate_series(-1, 1)) AS g) dy
    ),
    cand AS (
      SELECT a.pid AS a_id, r.b_id,
             round(2 * 6371000.0 * asin(sqrt(
               sin(radians(r.b_lat - a.lat) / 2) ^ 2
               + cos(radians(a.lat)) * cos(radians(r.b_lat))
                 * sin(radians(r.b_lon - a.lon) / 2) ^ 2
             )), 3) AS dist_m
      FROM cells a JOIN reps r ON a.cx = r.cx AND a.cy = r.cy
      WHERE a.pid < r.b_id
    )
    SELECT a_id, b_id, dist_m FROM cand
    WHERE dist_m <= {SPATIAL_RADIUS_M}
    ORDER BY a_id, b_id
    """,
    doc="Grid-cell-blocked spatial self-join: all point pairs within 40 m "
    "over an md5-scattered synthetic cloud — cell snap + 9-cell one-sided "
    "replication + equi-join (each true pair meets exactly once, no "
    "dedupe pass), exact haversine prunes candidates "
    "(operators/spatial.py; the corpus-scale join form of the reference's "
    "pairwise WGS84 distance predicates).",
)
def q_spatial_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import within_distance_pairs

    events = load(spark, sf_dir, "events")
    from ..operators.dedup import h32

    eid = F.col("event_id").cast("string")
    pts = events.select(
        F.col("event_id").alias("pid"),
        (F.lit(48.0) + (h32(F.concat(F.lit("lat"), eid)) % 20000) / 100000.0).alias("lat"),
        (F.lit(2.0) + (h32(F.concat(F.lit("lon"), eid)) % 30000) / 100000.0).alias("lon"),
    )
    return within_distance_pairs(
        pts, "pid", "lat", "lon", SPATIAL_RADIUS_M, SPATIAL_REF_LAT
    ).orderBy("a_id", "b_id")
