"""Temporal / sequence queries over the events stream (SURVEY.md §2.4/§2.6/§2.7).

Sessionization (gap-split), interval-overlap self-join, consecutive-duplicate
dedup (sliding(2)), and time-bucket histograms. All interval math is done on
epoch-microsecond BIGINTs for exact cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.interval_join import interval_overlap_self_join
from ..operators.location_events import match_events_to_stays
from ..operators.sessionize import sessionize
from ..tables import load
from .catalog import query

GAP_SECONDS = 30 * 60  # 30-min inactivity gap
BUCKET_SECONDS = 600  # 10-min histogram buckets (reference Clustering.scala:29-53)


# --- Q: sessionization (gap-split; reference §2.7 stay sessions) -------------


@query(
    "q_user_sessions",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN prev_us IS NULL OR ts_us - prev_us > {GAP_SECONDS} * 1000000 THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_id, ts_us,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events,
           (MAX(ts_us) - MIN(ts_us)) / 1000000 AS duration_secs
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    bench=True,
    doc="Gap-based sessionization (30-min inactivity), the skeleton of the "
    "reference's time-sequential stay grouping (LocationStayEnricher.scala:52-118).",
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    sessions = sessionize(events, ["user_id"], "ts", GAP_SECONDS, order_tiebreak=["event_id"])
    return (
        sessions.withColumn("ts_us", F.unix_micros("ts"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            ((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000)).alias("duration_secs"),
        )
        .orderBy("user_id", "session_id")
    )


# --- Q: interval-overlap self-join (reference LocationEventEnricher.scala) ---


@query(
    "q_overlapping_activity",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS start_us,
             epoch_us(ts) + CAST(value * 60 * 1000000 AS BIGINT) AS end_us
      FROM events WHERE event_type IN ('view', 'click')
    )
    SELECT a.user_id AS user_id, COUNT(*) AS n_overlapping_pairs,
           MIN(a.event_id) AS first_a_id
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.start_us <= b.end_us AND b.start_us <= a.end_us
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
    bench=True,
    doc="Temporal interval-overlap join via time-bucket equi-join (the scalable "
    "form of LocationEventEnricher.scala:66-95's event×stay loop). Each event "
    "spans [ts, ts + value minutes].",
)
def q_overlapping_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").filter(F.col("event_type").isin("view", "click"))
    iv = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("start_us"),
        (F.unix_micros("ts") + (F.col("value") * 60 * 1_000_000).cast("bigint")).alias("end_us"),
    )
    pairs = interval_overlap_self_join(
        iv, on=["user_id"], id_col="event_id", start_us="start_us", end_us="end_us", bucket_seconds=600
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count("*").alias("n_overlapping_pairs"), F.min("a_id").alias("first_a_id"))
        .orderBy("user_id")
    )


# --- Q: event × stay location matching (LocationEventEnricher) ---------------


@query(
    "q_location_events",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS event_start_us,
             epoch_us(ts) + CAST(round(value * 60 * 1000000) AS BIGINT) AS event_end_us,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE 48.0 + (event_id % 2) * 0.02 END AS event_lat,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE 2.0 + ((event_id // 2) % 2) * 0.03 END AS event_lon
      FROM events WHERE event_type = 'view'
    ),
    st AS (
      SELECT user_id, event_id AS stay_id,
             epoch_us(ts) AS stay_start_us,
             epoch_us(ts) + CAST(round(value * 180 * 1000000) AS BIGINT) AS stay_end_us,
             48.0 + (event_id % 2) * 0.02 AS stay_lat,
             2.0 + ((event_id // 2) % 2) * 0.03 AS stay_lon
      FROM events WHERE event_type = 'purchase'
    )
    SELECT ev.user_id AS user_id, event_id, stay_id,
           LEAST(event_end_us, stay_end_us) - GREATEST(event_start_us, stay_start_us)
             AS overlap_us
    FROM ev JOIN st ON ev.user_id = st.user_id
     AND event_start_us <= stay_end_us AND stay_start_us <= event_end_us
     AND CAST(LEAST(event_end_us, stay_end_us) - GREATEST(event_start_us, stay_start_us) AS DOUBLE)
         / CAST(event_end_us - event_start_us AS DOUBLE) > 0.2
     AND (event_lat IS NULL OR stay_lat IS NULL OR
          2 * 6371000.0 * asin(sqrt(
            sin(radians(stay_lat - event_lat) / 2) ^ 2
            + cos(radians(event_lat)) * cos(radians(stay_lat))
              * sin(radians(stay_lon - event_lon) / 2) ^ 2
          )) <= 1000.0)
    ORDER BY user_id, event_id, stay_id
    """,
    doc="Event × stay location matching (LocationEventEnricher.scala:66-95): "
    "interval overlap, >20% of the event's length, Haversine ≤ 1 km when both "
    "sides are geocoded (missing coordinates pass). 'view' events span "
    "[ts, ts+value min]; 'purchase' rows play the stays, 3× longer. "
    "Coordinates sit on a deterministic 2 km grid so the distance predicate "
    "is decided far from its threshold.",
)
def q_location_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_raw = load(spark, sf_dir, "events")
    lat = 48.0 + (F.col("event_id") % 2).cast("double") * 0.02
    lon = 2.0 + ((F.col("event_id") / 2).cast("bigint") % 2).cast("double") * 0.03
    nullable = F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
    ev = events_raw.filter(F.col("event_type") == "view").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("event_start_us"),
        (F.unix_micros("ts") + F.round(F.col("value") * 60 * 1_000_000).cast("bigint")).alias(
            "event_end_us"
        ),
        nullable.otherwise(lat).alias("event_lat"),
        nullable.otherwise(lon).alias("event_lon"),
    )
    st = events_raw.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("stay_id"),
        F.unix_micros("ts").alias("stay_start_us"),
        (F.unix_micros("ts") + F.round(F.col("value") * 180 * 1_000_000).cast("bigint")).alias(
            "stay_end_us"
        ),
        lat.alias("stay_lat"),
        lon.alias("stay_lon"),
    )
    return (
        match_events_to_stays(ev, st, on=["user_id"], bucket_seconds=3600)
        .select("user_id", "event_id", "stay_id", "overlap_us")
        .orderBy("user_id", "event_id", "stay_id")
    )


# --- Q: consecutive-duplicate dedup (reference sliding(2) §2.6) --------------


@query(
    "q_dedup_consecutive",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN prev_type IS NULL OR event_type <> prev_type THEN 1 ELSE 0 END) AS BIGINT) AS n_after_dedup
    FROM ordered
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Drop consecutive duplicates per key — the reference's sliding(2) "
    "resource dedup (LocationStayEnricher.scala:102-105) as a lag window.",
)
def q_dedup_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")), 1).otherwise(0)
            ).alias("n_after_dedup"),
        )
        .orderBy("user_id")
    )


# --- Q: 10-minute histogram (reference Clustering.scala:29-53) ---------------


@query(
    "q_event_histogram",
    oracle=f"""
    SELECT (epoch_us(ts) // ({BUCKET_SECONDS} * 1000000)) * {BUCKET_SECONDS} AS bucket_start_s,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Fixed-width time-window histogram — distribution report of "
    "observations per 10-min window (reference Clustering.scala:29-53).",
)
def q_event_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_micros("ts") / F.lit(BUCKET_SECONDS * 1_000_000)) * BUCKET_SECONDS).alias(
        "bucket_start_s"
    )
    return (
        events.groupBy(bucket, "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("bucket_start_s", "event_type")
    )


# --- Q: daily order stats (date bucketing as strings) ------------------------


@query(
    "q_daily_order_stats",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS month_total
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Calendar bucketing emitted as strings (timezone-proof): monthly order "
    "counts and exact decimal totals.",
)
def q_daily_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("month_total"),
        )
        .orderBy("order_month", "o_orderstatus")
    )


# --- Q: ordered conversion funnel --------------------------------------------


@query(
    "q_funnel",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(ts_us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts_us) AS t2
      FROM ev e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts_us > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts_us) AS t3
      FROM ev e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
      GROUP BY e.user_id
    )
    SELECT u.user_id,
           COALESCE(s1.t1, -1) AS view_us,
           COALESCE(s2.t2, -1) AS click_us,
           COALESCE(s3.t3, -1) AS purchase_us,
           CASE WHEN s3.t3 IS NOT NULL THEN 3
                WHEN s2.t2 IS NOT NULL THEN 2
                WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
    FROM (SELECT DISTINCT user_id FROM ev) u
    LEFT JOIN s1 ON s1.user_id = u.user_id
    LEFT JOIN s2 ON s2.user_id = u.user_id
    LEFT JOIN s3 ON s3.user_id = u.user_id
    ORDER BY 1
    """,
    doc="Ordered conversion funnel (view -> click -> purchase, each step "
    "strictly after the previous): per-user stage reached and step "
    "timestamps. The plan is CHAINED conditional aggregates — each step "
    "filters the event stream and joins only the USER-SIZED previous-step "
    "relation, so three steps cost three filtered scans + three "
    "user-keyed shuffles, never a per-user sort or a sequence-assembly "
    "collect_list; at 100 TB the step relations stay |users|-sized while "
    "events stream through the filters. -1 sentinels replace NULL "
    "timestamps so the output is non-nullable.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    ev = events.select("user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts_us").alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("t1", F.lit(-1)).alias("view_us"),
            F.coalesce("t2", F.lit(-1)).alias("click_us"),
            F.coalesce("t3", F.lit(-1)).alias("purchase_us"),
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
        )
        .orderBy("user_id")
    )


# --- Q: weekly cohort retention ----------------------------------------------

_WEEK_US = 7 * 24 * 3600 * 1_000_000


@query(
    "q_cohort_retention",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, c.cohort_week, e.week - c.cohort_week AS week_offset
      FROM ev e JOIN cohort c ON c.user_id = e.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active
    FROM active GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    doc="Weekly cohort retention matrix: users grouped by the epoch-week of "
    "their first event; n_active = distinct users of each cohort active at "
    "each week offset. Weeks are integer division of epoch microseconds "
    "(timezone- and calendar-free, identical on any engine). Plan: one "
    "user-keyed min aggregate (the cohort table, |users|-sized), a join "
    "that streams events against it, a distinct on (user, cohort, offset) "
    "and a counting aggregate — no windows, no sorts; the cohort join key "
    "is the natural even user_id distribution, not the skewed week.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    ev = events.select(
        "user_id", (F.unix_micros("ts") / F.lit(_WEEK_US)).cast("bigint").alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = (
        ev.join(cohort, "user_id")
        .select("user_id", "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .distinct()
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


# --- Q: SCD2 validity intervals from a change feed ----------------------------


@query(
    "q_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS ts_us,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT user_id, event_id, state, ts_us,
             CASE WHEN prev_state IS NULL OR state <> prev_state THEN 1 ELSE 0 END AS chg
      FROM ordered
    ),
    runs AS (
      SELECT user_id, state, ts_us,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
      FROM changes
    ),
    versions AS (
      SELECT user_id, run_id, MIN(state) AS state,
             MIN(ts_us) AS effective_from_us, COUNT(*) AS n_changes
      FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, run_id AS version, state, effective_from_us,
           COALESCE(LEAD(effective_from_us) OVER (PARTITION BY user_id ORDER BY run_id) - 1, -1)
             AS effective_to_us,
           n_changes
    FROM versions
    ORDER BY user_id, version
    """,
    doc="SCD2 row-versioning from a change feed: consecutive identical "
    "states per key collapse into one version row with "
    "[effective_from_us, effective_to_us] validity (open version = -1 "
    "sentinel) — the slowly-changing-dimension maintenance pattern, "
    "the row-level complement of q_incremental_agg's aggregate "
    "maintenance. The plan is one gaps-and-islands pass (lag + running "
    "change count), a run-keyed aggregate, and a lead window over the "
    "VERSION-sized relation — at 100 TB the change feed shuffles once "
    "by key and the interval assembly runs on collapsed versions, "
    "never raw changes.",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Running-sum order must carry the same (ts, event_id) tiebreak as the
    # lag window, or run_id assignment flips on timestamp ties run-to-run.
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        events.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("state"),
            F.unix_micros("ts").alias("ts_us"),
            F.lag("event_type").over(w).alias("prev_state"),
        )
        .withColumn(
            "chg",
            F.when(
                F.col("prev_state").isNull()
                | (F.col("state") != F.col("prev_state")),
                1,
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("chg").over(wrun))
    )
    versions = runs.groupBy("user_id", "run_id").agg(
        F.min("state").alias("state"),
        F.min("ts_us").alias("effective_from_us"),
        F.count("*").alias("n_changes"),
    )
    wlead = Window.partitionBy("user_id").orderBy("run_id")
    return (
        versions.select(
            "user_id",
            F.col("run_id").alias("version"),
            "state",
            "effective_from_us",
            F.coalesce(
                F.lead("effective_from_us").over(wlead) - 1, F.lit(-1)
            ).alias("effective_to_us"),
            "n_changes",
        )
        .orderBy("user_id", "version")
    )


# --- Q: trailing-interval rolling features ------------------------------------

ROLL_WINDOW_US = 3600 * 1_000_000  # trailing 1-hour RANGE frame


@query(
    "q_rolling_activity",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             CAST(value AS DECIMAL(18, 2)) AS val
      FROM events
    )
    SELECT user_id, event_id, ts_us,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w
                AS BIGINT) AS n_errors_1h,
           CAST(SUM(val) OVER w AS DOUBLE) AS sum_value_1h
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN {ROLL_WINDOW_US} PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts_us, event_id
    """,
    doc="Per-event trailing-1-hour activity features (event count, error "
    "count, exact DECIMAL value sum) via a RANGE-framed window — the "
    "interval-bounded frame class (vs the catalog's ROWS frames): the "
    "frame is defined by timestamp VALUE, so ties share one frame and the "
    "result is order-independent, and sums run on DECIMAL(18,2) so "
    "accumulation order cannot produce float drift. One shuffle by "
    "user_id; at 100 TB this is the feature-engineering window pass "
    "(trailing-interval rates for fraud/abuse/quality signals) running "
    "at one pass per key with no self-join.",
)
def q_rolling_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").cast("decimal(18,2)").alias("val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ROLL_WINDOW_US, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts_us",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).over(w).cast("bigint").alias("n_errors_1h"),
            F.sum("val").over(w).cast("double").alias("sum_value_1h"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


# --- Q: robust outlier gate (exact grouped median / MAD) -----------------------

MAD_Z = 3.0


@query(
    "q_outlier_mad",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    med AS (SELECT event_type, value AS median FROM r WHERE rn = (n + 1) // 2),
    d AS (
      SELECT e.event_type, e.event_id, m.median,
             ABS(e.value - m.median) AS adev
      FROM e JOIN med m USING (event_type)
    ),
    r2 AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn2,
             COUNT(*) OVER (PARTITION BY event_type) AS n2
      FROM d
    ),
    mad AS (SELECT event_type, adev AS mad FROM r2 WHERE rn2 = (n2 + 1) // 2)
    SELECT event_type,
           COUNT(*) AS n,
           MAX(d.median) AS median,
           MAX(mad.mad) AS mad,
           COUNT(*) FILTER (d.adev > {MAD_Z} * mad.mad) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Robust per-group outlier report: exact lower median and MAD of "
    "event values, outlier = |v - median| > 3*MAD. The grouped ranks come "
    "from the two-phase distributed prefix sum, NOT a per-group window "
    "sort — five event types over 100 TB would otherwise each sort on one "
    "task (operators/robust.py).",
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robust import mad_outlier_stats

    events = load(spark, sf_dir, "events")
    return mad_outlier_stats(
        events, "event_type", "value", "event_id", z=MAD_Z
    ).orderBy("event_type")
