"""Table profiling: per-column statistics for pipeline auditing.

Before a 100 TB corpus feeds training, you profile it: null rates, distinct
cardinalities, ranges. The profiler builds ONE aggregation over the scan, so
the table is read exactly once regardless of column count, then unpivots to
long format driver-side (#columns rows, trivially small).

Cost accounting (the honest version): null counts and min/max are plain
map-side-combined aggregates. EXACT distinct counts over N columns are
planned by Spark via the Expand rewrite — each row is replicated once per
distinct-aggregate column, then a PARTIAL hash aggregate dedupes
(column, value) pairs map-side before the shuffle, so shuffle volume is the
sum of per-partition distinct cardinalities, not N× the row count. That is
the inherent cost of exactness; for high-cardinality columns at extreme
scale pass ``approx=True`` to swap in HyperLogLog++ sketches
(approx_count_distinct), which ARE single-pass map-side-combined and make
the whole profile one narrow aggregation with no Expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nulls, n_distinct, min_s, max_s).

    min/max are reported as strings so one schema covers every column type;
    ordering semantics are the column's native ones (numeric min for
    numerics, lexicographic for strings), cast AFTER the aggregate.
    ``approx=True`` replaces exact count_distinct with HLL++ at relative
    standard deviation ``rsd`` (the scale path — see module docstring).
    """
    cols = columns or [c for c, _ in df.dtypes]
    nd = (
        (lambda c: F.approx_count_distinct(F.col(c), rsd))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    (row,) = df.agg(*aggs).collect()
    out = [
        (c, row["__n"], row[f"__nn_{c}"], row[f"__nd_{c}"], row[f"__mn_{c}"], row[f"__mx_{c}"])
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out, "column string, n_rows bigint, n_nulls bigint, n_distinct bigint, min_s string, max_s string"
    )
