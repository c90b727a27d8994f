"""Skew mitigation primitives.

AQE's skew-join splitting (enabled in session.RUNTIME_CONFS) handles
sort-merge join skew at runtime; these helpers cover the cases AQE cannot
re-plan: replicated-broadcast salting for a join whose hot keys must stay
co-partitioned with downstream keyed work, and two-phase salted
aggregation for high-cardinality-per-key aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_small_input(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the scan under-parallelizes the session.

    The inverse of skew: a scan that arrives in fewer partitions than the
    cluster has cores (one small parquet file, a gzip text file, a single
    kafka partition) serializes every narrow stage built on it — a
    CPU-heavy projection (tokenization, shingling, vector math) then runs
    on one core while the rest idle. This helper pays ONE small shuffle to
    spread the input, and is an exact no-op when the input already has
    >= ``target`` partitions — at 100 TB the scan arrives thousands of
    partitions wide and no shuffle is added, so it is safe to leave in the
    operator as the permanent guard rather than a local-mode hack.
    """
    if df.isStreaming:
        # no static partition count to inspect (and .rdd is illegal on a
        # stream); micro-batch parallelism is the source's to decide
        return df
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the LEFT side scattered over ``salt`` sub-keys and the
    right side replicated once per sub-key. A hot join key's rows spread
    over ``salt`` reducers instead of hammering one; the cost is a
    ``salt``× blow-up of the right side, so use with a small-to-medium
    right relation (the classic skewed-fact × dimension shape).

    Only left-preserving joins are sound: the right side is replicated
    ``salt`` times, so right/full outer joins would emit every unmatched
    right row once per salt copy."""
    allowed = ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross")
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not left-preserving; the replicated "
            f"right side would duplicate unmatched right rows (allowed: inner/left/semi/anti)"
        )
    if salt < 2:
        return left.join(right, on=on, how=how)
    l_salted = left.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt))
    )
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_salted.join(r_salted, on=[*on, "__salt"], how=how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial-aggregate on
    (keys, salt), then combine per key. ``aggs`` maps output column name →
    aggregate Column over the INPUT; only decomposable aggregates (sum,
    count via sum, min, max) are sound here — the second phase re-combines
    with sum/min/max by name prefix convention (sum_/min_/max_/count).
    Names outside that convention (avg_, count_distinct_, …) are rejected
    loudly: silently SUM-combining a non-decomposable partial aggregate
    would produce wrong values."""
    _ALLOWED = ("sum_", "min_", "max_", "count")
    # 'count_distinct_*' would pass a bare startswith('count') check and be
    # silently SUM-recombined (each salt bucket counts a value once) —
    # exactly the wrong-value case this guard exists to reject.
    bad = [
        n
        for n in aggs
        if not n.startswith(_ALLOWED) or n.startswith("count_distinct")
    ]
    if bad:
        raise ValueError(
            f"salted_agg: output names {bad} lack a decomposable prefix "
            f"(sum_/min_/max_/count*); avg, count_distinct and friends cannot "
            f"be re-combined across salt buckets — compute them unsalted or "
            f"decompose (avg = sum_x / count)"
        )
    # the name prefix only picks the combiner — the EXPRESSION must agree
    # with it, else a non-decomposable aggregate smuggled under a conforming
    # alias (salted_agg(df, k, {'count_rows': F.countDistinct('v')})) is
    # silently SUM-recombined into a wrong value. The Column repr hides
    # DISTINCT in Spark 4, so inspect the ANALYZED plan of a zero-row probe
    # (analysis only — nothing executes).
    import re as _re

    for name, col in aggs.items():
        try:
            probe = df.limit(0).groupBy().agg(col.alias("__probe"))
            plan = probe._jdf.queryExecution().analyzed().toString()
        except Exception:  # noqa: BLE001 — introspection unavailable
            continue  # (connect-style Column) name-prefix guard above stands
        m = _re.search(r"Aggregate \[(\w+)\((distinct )?", plan)
        fn, distinct = (m.group(1).lower(), bool(m.group(2))) if m else (None, False)
        want = (
            {"min"} if name.startswith("min_")
            else {"max"} if name.startswith("max_")
            else {"sum", "count"}  # SUM-recombined
        )
        if fn not in want or distinct:
            raise ValueError(
                f"salted_agg: aggregate for {name!r} is "
                f"{fn}{'(distinct)' if distinct else ''} — not a decomposable "
                f"{'/'.join(sorted(want))} expression; its salt-bucket "
                f"partials cannot be re-combined by the combiner the name "
                f"selects"
            )
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )

    def combine(name: str) -> Column:
        if name.startswith("min_"):
            return F.min(name)
        if name.startswith("max_"):
            return F.max(name)
        return F.sum(name)  # sums and counts re-combine by summing

    return partial.groupBy(*keys).agg(
        *[combine(name).alias(name) for name in aggs]
    )
