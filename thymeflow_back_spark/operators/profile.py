"""Table profiling: one-pass per-column statistics for pipeline auditing.

Before a 100 TB corpus feeds training, you profile it: null rates, distinct
cardinalities, ranges. The profiler builds ONE aggregation over the scan —
every per-column statistic is an agg expression, so the whole profile costs
a single map-side-combined pass regardless of column count — then unpivots
to long format driver-side (#columns rows, trivially small).

Distinct counts are exact (count_distinct) by default; at extreme
cardinality swap in the KMV sketch (operators/sketch.py) per column — the
output schema doesn't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nulls, n_distinct, min_s, max_s).

    min/max are reported as strings so one schema covers every column type;
    ordering semantics are the column's native ones (numeric min for
    numerics, lexicographic for strings), cast AFTER the aggregate.
    """
    cols = columns or [c for c, _ in df.dtypes]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
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
