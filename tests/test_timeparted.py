"""Derived date-partitioned layout (sources/timeparted.py): write-once
materialization, directory pruning, and value parity with the base table."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from thymeflow_back_spark.sources.timeparted import (
    ensure_time_partitioned,
    time_partitioned_path,
)
from thymeflow_back_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_layout_is_month_partitioned_and_write_once(spark):
    orders = ensure_time_partitioned(spark, SF, "orders", "o_orderdate", "o_month")
    path = time_partitioned_path(SF, "orders", "o_month")
    dirs = sorted(d for d in os.listdir(path) if d.startswith("o_month="))
    assert dirs, "expected o_month=YYYY-MM partition directories"
    assert all(len(d) == len("o_month=1996-01") for d in dirs), dirs
    # parity: the derived layout holds exactly the base table's rows
    base = load(spark, SF, "orders")
    assert orders.count() == base.count()
    # write-once: a second ensure reuses the committed layout (no rewrite)
    marker = os.path.join(path, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    ensure_time_partitioned(spark, SF, "orders", "o_orderdate", "o_month")
    assert os.path.getmtime(marker) == mtime


def test_range_filter_prunes_partition_directories(spark, tmp_path):
    from thymeflow_back_spark.sources.timeparted import write_time_partitioned

    path = str(tmp_path / "orders_by_month")
    write_time_partitioned(
        load(spark, SF, "orders"), path, "o_orderdate", "o_month"
    )
    # behavioral proof that unselected months are NEVER OPENED: corrupt
    # every parquet file of an out-of-range month — a ranged read that
    # pruned the directory succeeds, one that touches it must fail
    bad = tmp_path / "orders_by_month" / "o_month=1995-06"
    assert bad.is_dir()
    for f in bad.iterdir():
        if f.suffix == ".parquet":
            f.write_bytes(b"not a parquet file")
    ranged = spark.read.parquet(path).filter(
        (F.col("o_month") >= "1996-01") & (F.col("o_month") <= "1996-03")
    )
    plan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "(o_month" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    # values match a post-scan filter on the base table (pruning is lossless)
    base = load(spark, SF, "orders").filter(
        (F.date_format("o_orderdate", "yyyy-MM") >= "1996-01")
        & (F.date_format("o_orderdate", "yyyy-MM") <= "1996-03")
    )
    assert ranged.count() == base.count() > 0
    # and touching the corrupted month really would have failed
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as exc_info:
        spark.read.parquet(path).filter(F.col("o_month") == "1995-06").count()
    assert isinstance(exc_info.value, (Py4JJavaError, Exception))


def test_publish_once_committed_layout_short_circuits(tmp_path):
    from thymeflow_back_spark.sources.timeparted import publish_once

    dst = str(tmp_path / "layout")
    os.makedirs(dst)
    open(os.path.join(dst, "_SUCCESS"), "w").close()
    publish_once(dst, lambda t: (_ for _ in ()).throw(AssertionError("called")))


def test_publish_once_loser_discards_cleanly(tmp_path):
    """If another writer commits the target while ours is writing, our
    rename loses and our temp copy is discarded — the winner's layout is
    never touched."""
    from thymeflow_back_spark.sources.timeparted import publish_once

    dst = str(tmp_path / "layout")

    def write(tmp: str) -> None:
        os.makedirs(tmp)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        open(os.path.join(tmp, "loser.parquet"), "w").close()
        # the concurrent winner commits first
        os.makedirs(dst)
        open(os.path.join(dst, "_SUCCESS"), "w").close()
        open(os.path.join(dst, "winner.parquet"), "w").close()

    publish_once(dst, write)
    assert sorted(os.listdir(dst)) == ["_SUCCESS", "winner.parquet"]
    # no stranded temp directories
    assert os.listdir(tmp_path) == ["layout"]


def test_publish_once_refuses_uncommitted_residue(tmp_path):
    import pytest

    from thymeflow_back_spark.sources.timeparted import publish_once

    dst = str(tmp_path / "layout")
    # non-empty but uncommitted: a non-atomic writer's crash residue
    # (an EMPTY residue dir is atomically replaced by rename — harmless)
    os.makedirs(dst)
    open(os.path.join(dst, "part-0.parquet"), "w").close()

    def write(tmp: str) -> None:
        os.makedirs(tmp)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    with pytest.raises(RuntimeError, match="without _SUCCESS"):
        publish_once(dst, write)
