"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

A 100 TB table filtered on TWO columns can only skip files if the layout
clusters both at once — sorting by (a, b) gives perfect pruning on `a` and
none on `b`. Interleaving the bits of rank-scaled dimensions (the Morton /
Z-order curve, the same layout Delta's OPTIMIZE ZORDER BY and many
warehouse engines use) keeps file-level min/max ranges tight on BOTH
columns, so predicate-on-either prunes most files.

Everything here is deterministic arithmetic (min-max scale to 16-bit grid,
then bit interleave via div/mod — no engine-specific bit operators), so a
SQL oracle rebuilds identical codes; ``zorder_sql_expr`` emits the same
formula for any SQL dialect with integer division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16
Z_MAX = (1 << Z_BITS) - 1


def zorder_sql_expr(x16: str, y16: str, div: str, bits: int = Z_BITS) -> str:
    """Morton interleave of two pre-scaled integer expressions as portable
    SQL: sum over bit i of bit(x,i)·4^i + bit(y,i)·2·4^i. ``div`` is the
    dialect's integer-division operator ('div' for Spark SQL, '//' for
    DuckDB)."""
    terms = []
    for i in range(bits):
        p, w = 1 << i, 1 << (2 * i)
        terms.append(f"((({x16}) {div} {p}) % 2) * {w}")
        terms.append(f"((({y16}) {div} {p}) % 2) * {2 * w}")
    return " + ".join(terms)


def scale16_sql(col: str, mn: str, mx: str) -> str:
    """Min-max scale ``col`` onto the 16-bit grid, degenerate range -> 0.
    All arithmetic on doubles with one floor — identical in any engine."""
    return (
        f"CASE WHEN ({mx}) = ({mn}) THEN 0 ELSE "
        f"CAST(floor((({col}) - ({mn})) * {Z_MAX}.0 / (({mx}) - ({mn}))) AS BIGINT) END"
    )


def with_zorder(
    df: DataFrame, xcol: str, ycol: str, out: str = "z"
) -> DataFrame:
    """Add the Morton code of (xcol, ycol) as column ``out``.

    Column ranges come from one tiny min/max aggregate broadcast against
    the table (a single-row build side). Write clustered via
    ``df.repartitionByRange(n, out).sortWithinPartitions(out)`` — each
    output file then covers a compact Z-range, i.e. a tight rectangle in
    (x, y), which is what makes file-level min/max skipping effective on
    either column.
    """
    stats = df.agg(
        F.min(xcol).cast("double").alias("__xmn"),
        F.max(xcol).cast("double").alias("__xmx"),
        F.min(ycol).cast("double").alias("__ymn"),
        F.max(ycol).cast("double").alias("__ymx"),
    )
    x16 = scale16_sql(f"CAST({xcol} AS DOUBLE)", "__xmn", "__xmx")
    y16 = scale16_sql(f"CAST({ycol} AS DOUBLE)", "__ymn", "__ymx")
    # bind the scaled values ONCE as lambda variables — the interleave
    # references each 16 times, and inlined copies of the scale expression
    # would blow the tree up 32x (the same Catalyst-inlining trap the
    # shingle expression documents, operators/dedup.py)
    z = (
        f"aggregate(array(named_struct('x', {x16}, 'y', {y16})), 0L,"
        f" (acc, s) -> acc + {zorder_sql_expr('s.x', 's.y', 'div')})"
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out, F.expr(z))
        .drop("__xmn", "__xmx", "__ymn", "__ymx")
    )
