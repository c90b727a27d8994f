"""Incremental synchronizer state tests: UID/etag snapshot diffing, the
UID-validity reset path, and a full multi-round sync through the store's
graph-replace semantics (reference EmailSynchronizer.scala:460-527,
BaseDavSynchronizer.scala:130-195)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from thymeflow_back_spark.rdf.model import QUAD_SCHEMA
from thymeflow_back_spark.rdf.store import StatementStore
from thymeflow_back_spark.sources.sync_state import (
    dav_snapshot,
    imap_snapshot,
    snapshot_delta,
    sync_pass,
)


def _keys(df):
    return {(r.collection, r.item_id) for r in df.collect()}


def test_imap_delta_add_remove(spark):
    prev = imap_snapshot(spark, {("acc", "imap://inbox"): (1, [1, 2, 3])})
    cur = imap_snapshot(spark, {("acc", "imap://inbox"): (1, [2, 3, 4, 5])})
    delta = snapshot_delta(prev, cur)
    assert _keys(delta.to_fetch) == {("imap://inbox", "4"), ("imap://inbox", "5")}
    assert _keys(delta.to_remove) == {("imap://inbox", "1")}


def test_imap_uid_validity_reset_replaces_folder(spark):
    prev = imap_snapshot(spark, {("acc", "imap://inbox"): (1, [1, 2])})
    cur = imap_snapshot(spark, {("acc", "imap://inbox"): (2, [1, 7])})
    delta = snapshot_delta(prev, cur)
    # whole folder invalidated: every old message removed, every current re-fetched
    assert _keys(delta.to_remove) == {("imap://inbox", "1"), ("imap://inbox", "2")}
    assert _keys(delta.to_fetch) == {("imap://inbox", "1"), ("imap://inbox", "7")}


def test_disappeared_folder_removes_all_items(spark):
    prev = imap_snapshot(
        spark, {("acc", "imap://inbox"): (1, [1]), ("acc", "imap://old"): (9, [5, 6])}
    )
    cur = imap_snapshot(spark, {("acc", "imap://inbox"): (1, [1])})
    delta = snapshot_delta(prev, cur)
    assert _keys(delta.to_fetch) == set()
    assert _keys(delta.to_remove) == {("imap://old", "5"), ("imap://old", "6")}


def test_dav_etag_change_triggers_refetch_not_remove(spark):
    prev = dav_snapshot(
        spark, {("acc", "dav://cal/"): [("a.ics", "e1"), ("b.ics", "e2")]}
    )
    cur = dav_snapshot(
        spark, {("acc", "dav://cal/"): [("a.ics", "e1"), ("b.ics", "e9"), ("c.ics", "e3")]}
    )
    delta = snapshot_delta(prev, cur)
    assert _keys(delta.to_fetch) == {("dav://cal/", "b.ics"), ("dav://cal/", "c.ics")}
    assert _keys(delta.to_remove) == set()


def _fake_server_fetcher(payloads: dict[str, str]):
    """Executor-side fetcher: item -> one quad carrying the payload as a name."""

    def fetch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in batch.iterrows():
            graph = f"{r['collection']}#{r['item_id']}"
            body = payloads[r["item_id"]]
            rows.append(
                (
                    f"urn:item:{r['item_id']}",
                    "http://schema.org/name",
                    body,
                    "literal",
                    "http://www.w3.org/2001/XMLSchema#string",
                    None,
                    graph,
                )
            )
        return pd.DataFrame(rows, columns=list(QUAD_SCHEMA.names))

    return fetch


def test_multi_round_sync_through_store(spark):
    empty = StatementStore(spark.createDataFrame([], QUAD_SCHEMA))
    none = imap_snapshot(spark, {})

    # round 1: initial full sync of 2 messages
    cur1 = imap_snapshot(spark, {("acc", "imap://inbox"): (1, [1, 2])})
    store, diff, snap = sync_pass(
        empty, none, cur1, _fake_server_fetcher({"1": "one", "2": "two"})
    )
    store = store.materialize()
    assert store.quads.count() == 2
    assert diff.added.count() == 2 and diff.removed.count() == 0

    # round 2: message 1 deleted, message 3 arrives, message 2 unchanged
    cur2 = imap_snapshot(spark, {("acc", "imap://inbox"): (1, [2, 3])})
    store, diff, snap = sync_pass(
        store, snap, cur2, _fake_server_fetcher({"2": "two", "3": "three"})
    )
    store = store.materialize()
    values = {r.object_value for r in store.quads.collect()}
    assert values == {"two", "three"}
    # incremental: only msg 3 was fetched/added, only msg 1's graph touched
    assert {r.object_value for r in diff.added.collect()} == {"three"}
    assert {r.object_value for r in diff.removed.collect()} == {"one"}

    # round 3: UID-validity reset — same UIDs, changed content server-side
    cur3 = imap_snapshot(spark, {("acc", "imap://inbox"): (2, [2, 3])})
    store, diff, snap = sync_pass(
        store, snap, cur3, _fake_server_fetcher({"2": "TWO'", "3": "three"})
    )
    store = store.materialize()
    values = {r.object_value for r in store.quads.collect()}
    assert values == {"TWO'", "three"}
    # graph replace is idempotent: unchanged msg-3 content survives as-is
    assert {r.object_value for r in diff.added.collect()} == {"TWO'"}
    assert {r.object_value for r in diff.removed.collect()} == {"two"}


def test_dav_changed_etag_replaces_document_graph(spark):
    empty = StatementStore(spark.createDataFrame([], QUAD_SCHEMA))
    none = dav_snapshot(spark, {})
    cur1 = dav_snapshot(spark, {("acc", "dav://card/"): [("a.vcf", "e1")]})
    store, _, snap = sync_pass(empty, none, cur1, _fake_server_fetcher({"a.vcf": "Alice"}))
    store = store.materialize()

    cur2 = dav_snapshot(spark, {("acc", "dav://card/"): [("a.vcf", "e2")]})
    store, diff, _ = sync_pass(store, snap, cur2, _fake_server_fetcher({"a.vcf": "Alicia"}))
    assert {r.object_value for r in store.quads.collect()} == {"Alicia"}
    assert {r.object_value for r in diff.removed.collect()} == {"Alice"}
