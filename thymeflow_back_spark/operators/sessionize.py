"""Sessionization: split per-key ordered event streams on inactivity gaps.

Spark shape of the reference's time-sequential grouping (stay clustering uses
a richer distance criterion — LocationStayEnricher.scala:52-118 — but the
gap-split skeleton is this): one shuffle on the key, then window functions
(lag + running sum) inside each partition. Scales linearly; no Python in the
hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session index (0-based) to every row.

    A new session starts when the gap to the previous event (per key, ordered
    by ``ts_col`` then ``order_tiebreak``) exceeds ``gap_seconds``.
    """
    order: list[Column] = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    new_session = F.when(prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    running = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(session_col, F.sum(new_session).over(running) - F.lit(1))
