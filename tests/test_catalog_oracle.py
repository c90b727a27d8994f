"""Catalog-wide oracle test: every declared query must hash-match its DuckDB
oracle at sf0.001 (the driver gate runs sf0.01 — same comparison, more rows).
"""

from __future__ import annotations

import duckdb
import pytest

from thymeflow_back_spark import queries as catalog
from thymeflow_back_spark.tables import TABLE_NAMES

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tools.check import compare  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(catalog.QUERIES))
def test_query_matches_oracle(name, spark, oracle_con):
    from thymeflow_back_spark.operators.cachereg import release_pinned

    q = catalog.QUERIES[name]
    try:
        spark_pd = q.spark(spark, SF_SMOKE).toPandas()
    finally:
        release_pinned()  # operator/store pins are per-query state
    if q.oracle is None:
        assert spark_pd is not None  # rows-only check
        return
    oracle_pd = oracle_con.execute(q.oracle).fetchdf()
    problems = compare(name, spark_pd, oracle_pd)
    assert not problems, problems


def test_entry_runs(spark):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10


def test_driver_priority_names_exist():
    """A typo in _DRIVER_PRIORITY silently deprioritizes a query in the
    driver's 50-row rotation window — fail loudly instead."""
    from thymeflow_back_spark.queries.catalog import _DRIVER_PRIORITY, QUERIES

    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"unknown names in _DRIVER_PRIORITY: {missing}"
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY)


def test_query_map_order_leads_with_unverified():
    """queries() must present the stalest driver record first: the 33 rows
    whose freshest driver check is r7 (q_sync_delta, the graph family, the
    sketch family among them), then any never-driver-verified round-11
    additions, then the r8 block, so the driver's 50-row window re-greens
    the stalest record. The invariant is that the map's head IS the
    priority list, verbatim — a fixed window assertion went stale every
    time the new-row block grew."""
    from thymeflow_back_spark.queries.catalog import _DRIVER_PRIORITY, query_map

    order = list(query_map())
    assert order[: len(_DRIVER_PRIORITY)] == list(_DRIVER_PRIORITY)
    # the r7-stale rows stay inside the driver's 50-row correctness window
    head50 = order[:50]
    assert order[0] == "q_deterministic_shuffle"
    for name in ("q_sync_delta", "q_pagerank", "q_triangle_stats", "q_kcore",
                 "q_distinct_hll", "q_distinct_kmv", "q_fts_bm25",
                 "q_vocab_topk", "q_semantic_components",
                 "q_streaming_components", "q_lsh_param_select"):
        assert name in head50, (name, head50)
