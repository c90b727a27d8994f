"""Catalog coverage for the incremental synchronizer CDC diff.

Two deterministic snapshots are derived from the events table (collection =
user_id, item = event_id) and fed through ``snapshot_delta`` — the exact
operator the IMAP/DAV sync passes run (reference
EmailSynchronizer.scala:460-527, BaseDavSynchronizer.scala:130-171). The
synthetic versions exercise all three delta classes at once: new items
(membership change), changed etags (item_version change), and UID-validity
resets (collection_version change → whole-collection replace).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.sync_state import SNAPSHOT_COLUMNS, snapshot_delta
from ..tables import load
from .catalog import query

_ORACLE = """
WITH prev AS (
  SELECT 's' AS source, CAST(user_id AS VARCHAR) AS collection,
         CAST(event_id AS VARCHAR) AS item_id
  FROM events WHERE event_id % 7 <> 0
),
cur AS (
  SELECT 's' AS source, CAST(user_id AS VARCHAR) AS collection,
         CAST(event_id AS VARCHAR) AS item_id,
         CASE WHEN event_id % 13 = 0 THEN 'v2' ELSE 'v1' END AS item_version,
         user_id
  FROM events WHERE event_id % 5 <> 0
),
reset AS (
  SELECT DISTINCT c.collection
  FROM cur c
  WHERE c.user_id % 97 = 0 AND c.collection IN (SELECT collection FROM prev)
),
fch AS (
  SELECT collection, item_id FROM cur
  WHERE collection IN (SELECT collection FROM reset)
  UNION
  SELECT c.collection, c.item_id FROM cur c
  WHERE c.collection NOT IN (SELECT collection FROM reset)
    AND (c.item_id NOT IN (SELECT item_id FROM prev p WHERE p.collection = c.collection)
         OR c.item_version <> 'v1')
),
rem AS (
  SELECT collection, item_id FROM prev
  WHERE collection IN (SELECT collection FROM reset)
  UNION
  SELECT p.collection, p.item_id FROM prev p
  WHERE p.collection NOT IN (SELECT collection FROM reset)
    AND p.item_id NOT IN (SELECT item_id FROM cur c WHERE c.collection = p.collection)
)
SELECT change, collection, item_id FROM (
  SELECT 'fetch' AS change, * FROM fch
  UNION ALL
  SELECT 'remove' AS change, * FROM rem
)
ORDER BY change, collection, item_id
"""


@query(
    "q_sync_delta",
    oracle=_ORACLE,
    doc="Incremental sync CDC: snapshot anti-join diff with per-item etag "
    "changes and collection-version (UID-validity) resets, over synthetic "
    "snapshots of the events table. One metadata-only shuffle per pass; "
    "only the emitted fetch set would touch the network.",
)
def q_sync_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    prev = events.filter(F.col("event_id") % 7 != 0).select(
        F.lit("s").alias("source"),
        F.col("user_id").cast("string").alias("collection"),
        F.lit("1").alias("collection_version"),
        F.col("event_id").cast("string").alias("item_id"),
        F.lit("v1").alias("item_version"),
    )
    cur = events.filter(F.col("event_id") % 5 != 0).select(
        F.lit("s").alias("source"),
        F.col("user_id").cast("string").alias("collection"),
        F.when(F.col("user_id") % 97 == 0, "2").otherwise("1").alias("collection_version"),
        F.col("event_id").cast("string").alias("item_id"),
        F.when(F.col("event_id") % 13 == 0, "v2").otherwise("v1").alias("item_version"),
    )
    assert list(prev.columns) == list(SNAPSHOT_COLUMNS)
    delta = snapshot_delta(prev, cur)
    out = delta.to_fetch.select(
        F.lit("fetch").alias("change"), "collection", "item_id"
    ).unionByName(
        delta.to_remove.select(F.lit("remove").alias("change"), "collection", "item_id")
    )
    return out.dropDuplicates().orderBy("change", "collection", "item_id")
