"""Incremental synchronizer state: snapshot-diff CDC for IMAP/DAV sources.

The reference's synchronizers are *continuous incremental* — they never
re-convert the whole account, only the delta since the last pass:

- EmailSynchronizer keeps, per IMAP folder, the folder's UID-validity plus
  the set of message UIDs already delivered; a sync pass diffs the folder's
  current UID listing against that set to derive messages to add / remove,
  and a UID-validity change invalidates the whole folder (remove everything,
  re-add everything) (reference EmailSynchronizer.scala:87-91, 460-471,
  520-527).
- BaseDavSynchronizer keeps an etag per resource path and fetches only
  resources whose etag is new or changed, in multiget batches of 100
  (reference BaseDavSynchronizer.scala:130-195).

Spark shape: the per-source state is a SNAPSHOT TABLE
(source, collection, collection_version, item_id, item_version) — for IMAP
collection=folder URL, collection_version=uidValidity, item_id=UID; for DAV
collection=directory URI, item_id=resource path, item_version=etag. A sync
pass is two anti-joins between the stored snapshot and the current server
listing (metadata only — cheap), and ONLY the resulting to-fetch set hits
the network, executor-side via mapInPandas with an injectable fetcher (the
reference fetches on parallel connections; here each partition fetches its
batch, the analogue of the 100-resource multiget / 512-message fetch
buffer). At 100 TB the snapshot is a Delta table MERGEd per pass; the diff
below is the MERGE's source query.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..rdf.model import QUAD_SCHEMA
from ..rdf.store import Diff, StatementStore

SNAPSHOT_COLUMNS = ("source", "collection", "collection_version", "item_id", "item_version")
SNAPSHOT_SCHEMA = StructType(
    [StructField(c, StringType(), c in ("collection_version", "item_version")) for c in SNAPSHOT_COLUMNS]
)

_KEY = ["source", "collection", "item_id"]


@dataclass(frozen=True)
class SyncDelta:
    """Result of diffing the stored snapshot against a fresh listing."""

    to_fetch: DataFrame  # snapshot rows (from current) whose payload must be (re)fetched
    to_remove: DataFrame  # snapshot rows (from previous) whose documents must be dropped


def snapshot(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, SNAPSHOT_SCHEMA)


def imap_snapshot(
    spark: SparkSession, listing: dict[tuple[str, str], tuple[int, list[int]]]
) -> DataFrame:
    """{(source, folder_url): (uid_validity, [uid, ...])} → snapshot rows.

    IMAP items carry no per-item version — membership plus the folder-level
    UID-validity is the whole CDC state (EmailSynchronizer.scala:87-91)."""
    rows = [
        (src, folder, str(uid_validity), str(uid), None)
        for (src, folder), (uid_validity, uids) in listing.items()
        for uid in uids
    ]
    return snapshot(spark, rows)


def dav_snapshot(
    spark: SparkSession, listing: dict[tuple[str, str], list[tuple[str, str]]]
) -> DataFrame:
    """{(source, directory_uri): [(path, etag), ...]} → snapshot rows.

    DAV resources are versioned individually by etag; directories have no
    collection version (BaseDavSynchronizer.scala:140-171)."""
    rows = [
        (src, directory, None, path, etag)
        for (src, directory), resources in listing.items()
        for path, etag in resources
    ]
    return snapshot(spark, rows)


def _reset_collections(previous: DataFrame, current: DataFrame) -> DataFrame:
    """(source, collection) pairs whose collection_version changed — the
    UID-validity invalidation: every stored item is dropped and every current
    item re-fetched (EmailSynchronizer.scala:520-527)."""
    prev_c = previous.select("source", "collection", "collection_version").distinct()
    cur_c = current.select(
        "source", "collection", F.col("collection_version").alias("cur_version")
    ).distinct()
    return (
        prev_c.join(cur_c, on=["source", "collection"])
        .filter(~F.col("collection_version").eqNullSafe(F.col("cur_version")))
        .select("source", "collection")
    )


def snapshot_delta(previous: DataFrame, current: DataFrame) -> SyncDelta:
    """Pure snapshot CDC: ONE full-outer join on the sync key + the
    broadcast collection-reset expansion, classified per row.

    - fetch: current items that are new, whose item_version (etag) changed,
      or that live in a reset collection.
    - remove: previous items gone from the listing, or in a reset collection.
      (An item with a changed etag is NOT in `remove`: re-adding its document
      graph replaces the old content — Pipeline's idempotent graph replace.)
    - A collection present in `previous` with no rows in `current` means the
      folder/directory disappeared: all its items are removed (reference
      unsubscribes the folder and removes its messages on
      FolderNotFoundException).

    Presence on each side is carried by an explicit flag, not version
    nullability: a plain left join's NULL item_version would be ambiguous
    between "no previous row" and "previous row with NULL version" (IMAP
    items carry no item_version at all). One hash exchange per snapshot —
    both delta classes and the reset expansion read the same joined
    relation, so at 100 TB the pass costs a single co-partitioned shuffle
    of item METADATA (the payload fetch stays out-of-band).
    """
    # collections are few relative to items (folders vs messages), so the
    # reset set broadcasts
    reset = F.broadcast(
        _reset_collections(previous, current).withColumn("__reset", F.lit(True))
    )
    p = previous.select(
        *_KEY,
        F.col("collection_version").alias("__p_cver"),
        F.col("item_version").alias("__p_iver"),
        F.lit(True).alias("__p"),
    )
    c = current.select(
        *_KEY,
        F.col("collection_version").alias("__c_cver"),
        F.col("item_version").alias("__c_iver"),
        F.lit(True).alias("__c"),
    )
    full = c.join(p, on=_KEY, how="full_outer").join(
        reset, on=["source", "collection"], how="left"
    )
    in_cur, in_prev = F.col("__c").isNotNull(), F.col("__p").isNotNull()
    is_reset = F.col("__reset").isNotNull()
    changed = ~F.col("__c_iver").eqNullSafe(F.col("__p_iver"))
    to_fetch = full.filter(in_cur & (is_reset | ~in_prev | changed)).select(
        "source",
        "collection",
        F.col("__c_cver").alias("collection_version"),
        "item_id",
        F.col("__c_iver").alias("item_version"),
    )
    to_remove = full.filter(in_prev & (is_reset | ~in_cur)).select(
        "source",
        "collection",
        F.col("__p_cver").alias("collection_version"),
        "item_id",
        F.col("__p_iver").alias("item_version"),
    )
    return SyncDelta(to_fetch=to_fetch, to_remove=to_remove)


def doc_iri_col(collection: Column, item_id: Column) -> Column:
    """Document graph IRI for a synced item — the reference uses the item's
    URL (folder URL + '#' + UID / the DAV resource URL)."""
    return F.concat(collection, F.lit("#"), item_id)


# fetcher(batch: pd.DataFrame[source, collection, item_id, item_version])
#   -> pd.DataFrame with QUAD_SCHEMA columns (already converted to quads).
Fetcher = Callable[[pd.DataFrame], pd.DataFrame]


def fetch_quads(to_fetch: DataFrame, fetcher: Fetcher, batch_size: int = 100) -> DataFrame:
    """Run `fetcher` executor-side over the to-fetch set, in batches.

    The fetcher sees at most `batch_size` rows per call (the DAV multiget
    batch; EmailSynchronizer caps fetch buffers at 512) and must mint each
    item's quads into its document graph (doc_iri_col convention).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                out = fetcher(chunk)
                yield out.reindex(columns=list(QUAD_SCHEMA.names))
        yield pd.DataFrame(columns=list(QUAD_SCHEMA.names))

    cols = to_fetch.select("source", "collection", "item_id", "item_version")
    return cols.mapInPandas(run, QUAD_SCHEMA)


def sync_pass(
    store: StatementStore,
    previous: DataFrame,
    current: DataFrame,
    fetcher: Fetcher,
    batch_size: int = 100,
) -> tuple[StatementStore, Diff, DataFrame]:
    """One incremental synchronization pass.

    Returns (new_store, effective_diff, next_snapshot). Removed items'
    document graphs are replaced with the empty set (negation/user edits in
    other graphs survive — same path as an empty re-delivery); fetched items
    go through the batched document-replace, so a re-fetched changed item is
    an idempotent graph replacement.
    """
    delta = snapshot_delta(previous, current)
    quads = fetch_quads(delta.to_fetch, fetcher, batch_size=batch_size)
    removed_graphs = delta.to_remove.select(
        doc_iri_col(F.col("collection"), F.col("item_id")).alias("graph")
    )
    fetched_graphs = delta.to_fetch.select(
        doc_iri_col(F.col("collection"), F.col("item_id")).alias("graph")
    )
    new_store, diff = store.add_documents(
        quads, graphs=removed_graphs.unionByName(fetched_graphs)
    )
    return new_store, diff, current
