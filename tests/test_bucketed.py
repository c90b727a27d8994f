"""Bucketed tables: the write-once-shuffle, join-forever-free contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.sources.bucketed import bucketed_join, write_bucketed
from thymeflow_back_spark.tables import load


@pytest.fixture()
def no_broadcast(spark):
    """Force a shuffle-capable join strategy so the Exchange assertion is
    about BUCKETING, not about the dim side being broadcast-small."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(customer, "bt_customer", str(tmp_path / "c"), ["c_custkey"], 4)
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "bt_orders",
        str(tmp_path / "o"),
        ["c_custkey"],
        4,
    )
    try:
        joined = bucketed_join(spark, "bt_orders", "bt_customer", "c_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

        # and the answer matches the plain (shuffled) join
        expect = (
            orders.join(
                customer, orders.o_custkey == customer.c_custkey
            ).agg(
                F.count("*").alias("n"),
                F.sum("o_totalprice").alias("total"),
            )
        ).collect()[0]
        got = joined.agg(
            F.count("*").alias("n"), F.sum("o_totalprice").alias("total")
        ).collect()[0]
        assert got.n == expect.n
        # fp sums differ in addition order across partitionings
        assert got.total == pytest.approx(expect.total, rel=1e-12)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_customer")


def test_bucketed_sorted_scan_skips_sort(spark, sf_dir, tmp_path, no_broadcast):
    """sortBy at write time: the sort-merge join reads pre-sorted buckets,
    so the plan needs no Sort on the bucketed side."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    write_bucketed(nation, "bt_n1", str(tmp_path / "n1"), ["n_nationkey"], 2)
    write_bucketed(
        nation.withColumnRenamed("n_name", "n_name2"),
        "bt_n2",
        str(tmp_path / "n2"),
        ["n_nationkey"],
        2,
    )
    try:
        joined = bucketed_join(spark, "bt_n1", "bt_n2", "n_nationkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == nation.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_n1")
        spark.sql("DROP TABLE IF EXISTS bt_n2")
