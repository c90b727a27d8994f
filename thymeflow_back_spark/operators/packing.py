"""Sequence packing and distributed prefix sums.

LLM training consumes fixed-size token windows, so the pipeline step before
tokenized output is PACKING: lay the corpus out in a stable global order and
assign each document to the context chunk where its first token lands. The
core primitive is a global running token count — an inherently sequential
fold that a naive `Window.orderBy(...)` computes on ONE task (a non-starter
at 100 TB). ``distributed_prefix_sum`` is the classic two-phase parallel
scan instead:

  1. range-partition by the order key (contiguous key ranges per partition),
  2. per-partition running sums in parallel (window partitioned by the
     physical partition id),
  3. one tiny pass over the per-partition totals produces each partition's
     global offset, broadcast-joined back.

Only step 1 shuffles the data (once); step 3's window runs over
#partitions rows. Output values depend only on the global key order, never
on partitioning, so the result is deterministic and the DuckDB oracle is a
plain `SUM(...) OVER (ORDER BY key)`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cachereg import pin


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str | list[str],
    value_col: str | Column,
    out_col: str = "prefix",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global prefix sum of ``value_col`` in ``order_col`` order, in parallel.

    ``order_col`` is one column name or a list (compared lexicographically);
    the combination must be globally unique (ties across a partition boundary
    would make the fold order — and thus the result — ambiguous).
    ``exclusive=True`` yields the sum of strictly-preceding rows (0 for the
    first row). Values may be negative; totals are computed with SUM, not
    from the running column.

    For several running sums over the SAME order, use
    :func:`distributed_prefix_sums` — it pays the range exchange once.
    """
    return distributed_prefix_sums(
        df, order_col, {out_col: value_col}, exclusive=exclusive,
        num_partitions=num_partitions,
    )


def distributed_prefix_sums(
    df: DataFrame,
    order_col: str | list[str],
    values: dict[str, str | Column],
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Several global prefix sums sharing ONE range exchange.

    ``values`` maps output column name -> value column (name or Column).
    Semantics per output match :func:`distributed_prefix_sum`; the range
    shuffle, the pinned boundary draw, the per-partition running pass, and
    the offsets pass are all paid once for the whole set.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    vals = {
        out: (F.col(v) if isinstance(v, str) else v) for out, v in values.items()
    }
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # PERSIST is load-bearing, not a speedup: the per-partition pass and the
    # offset pass both consume `parted`, and without pinning it each runs
    # its own range exchange. RangePartitioner re-samples "imbalanced"
    # input partitions with a seed derived from the RDD id — a global
    # counter — so two executions can draw DIFFERENT range boundaries, and
    # the offsets then describe a different partitioning than the local
    # ranks (observed: non-bijective ranks on a single-partition cached
    # input). Materializing the shuffled relation once freezes one
    # boundary draw and one __pid assignment for every consumer; the final
    # prefix values depend only on the global key order, so the OUTPUT is
    # deterministic even though the partition split is not.
    keys = list(vals)
    parted = df
    for i, out in enumerate(keys):
        parted = parted.withColumn(f"__v{i}", vals[out])
    parted = parted.repartitionByRange(
        n, *[F.col(c) for c in order_cols]
    ).withColumn("__pid", F.spark_partition_id())
    parted = pin(parted)
    run = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = parted
    for i in range(len(keys)):
        local = local.withColumn(f"__local{i}", F.sum(f"__v{i}").over(run))
    off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parted.groupBy("__pid")
        .agg(*[F.sum(f"__v{i}").alias(f"__tot{i}") for i in range(len(keys))])
        .select(
            "__pid",
            *[
                F.coalesce(F.sum(f"__tot{i}").over(off_w), F.lit(0)).alias(f"__off{i}")
                for i in range(len(keys))
            ],
        )
    )
    out_df = local.join(F.broadcast(offsets), "__pid")
    drops = ["__pid"]
    for i, out in enumerate(keys):
        prefix = F.col(f"__local{i}") + F.col(f"__off{i}")
        if exclusive:
            prefix = prefix - F.col(f"__v{i}")
        out_df = out_df.withColumn(out, prefix)
        drops += [f"__v{i}", f"__local{i}", f"__off{i}"]
    return out_df.drop(*drops)


def pack_chunks(
    df: DataFrame,
    order_col: str,
    token_col: str | Column,
    budget: int,
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """Assign each document to the fixed-token-budget chunk where it starts.

    The corpus is conceptually concatenated in ``order_col`` order and cut
    every ``budget`` tokens; a document's chunk is floor(tokens-before / budget)
    — the streaming concat-and-chunk layout LLM training uses (documents may
    span a cut; they belong to the chunk holding their first token).
    """
    token = F.col(token_col) if isinstance(token_col, str) else token_col
    out = distributed_prefix_sum(
        df.withColumn("__tok", token), order_col, "__tok", out_col="__before",
        exclusive=True,
    )
    return out.withColumn(
        chunk_col, F.floor(F.col("__before") / F.lit(budget)).cast("bigint")
    ).drop("__before", "__tok")
