"""Streaming exact heavy hitters: mergeable Misra-Gries state across batches.

The batch operator (operators/heavyhitters.py) proves the two-pass form;
a continuously-ingesting pipeline needs the incremental form: maintain a
BOUNDED summary as batches arrive, and answer "which tokens exceed N/k of
everything seen so far" without ever re-scanning history for candidates.

The state is the classic mergeable MG summary (Agarwal et al., "Mergeable
Summaries", PODS 2012): at most k (token, cnt) counters plus the exact
stream total. Per micro-batch:

1. the batch folds to per-partition MG summaries WITH counter values
   (Arrow pass, O(k) memory per partition, no shuffle),
2. the driver merges them into the persisted summary — counter-wise sum,
   then if more than k counters survive, subtract the (k+1)-th largest
   and drop non-positives. The merge preserves the MG guarantee: every
   token with global count > N/k keeps a positive counter (its total
   decrement across all merges is bounded by N/(k+1)), so the summary is
   always a SUPERSET of the true heavy hitters,
3. the new summary is published as a batch-id-suffixed parquet (write
   once, never modified — the latest id wins; batches of one stream are
   strictly sequential, so there is a single writer by construction).

The final answer re-counts the <= k candidates EXACTLY (one broadcast
semi-join pass — the batch operator's pass 2), so the output is a pure
function of the data and a plain GROUP BY / HAVING oracle hash-matches it.
State size: k counters + one total — independent of corpus size.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _mg_counting_partition(col: str, k: int):
    """Per-partition MG summary KEEPING counter values: (token, cnt) rows
    plus one NULL-keyed sentinel carrying the partition's exact row count
    (the count-free variant lives in operators/heavyhitters.py; streaming
    needs the values to merge across batches)."""
    import pandas as pd

    def gen(batches):
        counters: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for tok, c in pdf[col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - cut for t, c in counters.items() if c > cut}
        keys = sorted(counters)
        yield pd.DataFrame(
            {
                col: pd.Series(keys + [None], dtype=object),
                "cnt": pd.Series(
                    [counters[t] for t in keys] + [seen], dtype="int64"
                ),
            }
        )

    return gen


def merge_mg(
    state: dict[str, int], incoming: list[tuple[str, int]], k: int
) -> dict[str, int]:
    """Merge counter lists into ``state`` under the k-counter budget —
    the PODS-2012 merge: sum, then one (k+1)-th-largest decrement."""
    for tok, cnt in incoming:
        state[tok] = state.get(tok, 0) + cnt
    if len(state) > k:
        cut = sorted(state.values(), reverse=True)[k]
        state = {t: c - cut for t, c in state.items() if c > cut}
    return state


def _state_dirs(spark: SparkSession, state_dir: str) -> list[tuple[int, str]]:
    """COMMITTED summaries only: a directory without _SUCCESS is a torn
    crash leftover (overwrite deletes, then the job dies pre-commit) and
    reading it would yield a partial counter set / understated total.
    Non-numeric siblings (editor backups etc.) are skipped, not fatal."""
    from .dedup_stream import _hadoop_fs

    jvm = spark._jvm
    fs, root = _hadoop_fs(spark, state_dir)
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("summary_b"):
            continue
        try:
            bid = int(name[len("summary_b"):])
        except ValueError:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(
            posixpath.join(state_dir, name, "_SUCCESS")
        )
        if fs.exists(marker):
            out.append((bid, posixpath.join(state_dir, name)))
    return sorted(out)


def load_hh_state(
    spark: SparkSession, state_dir: str, col: str, before: int | None = None
) -> tuple[dict[str, int], int]:
    """(counters, total) from the highest-batch-id published summary.
    ``before`` restricts to ids < before — the replay guard: a batch
    re-delivered after a checkpoint recovery must merge against the
    PRE-batch state, not its own published output (idempotent rewrite)."""
    dirs = _state_dirs(spark, state_dir)
    if before is not None:
        dirs = [d for d in dirs if d[0] < before]
    if not dirs:
        return {}, 0
    rows = spark.read.parquet(dirs[-1][1]).collect()
    counters = {r[col]: r["cnt"] for r in rows if r[col] is not None}
    total = sum(r["cnt"] for r in rows if r[col] is None)
    return counters, total


def run_streaming_heavy_hitters(
    stream: DataFrame,
    col: str,
    k: int,
    state_dir: str,
) -> StreamingQuery:
    """foreachBatch job maintaining the MG summary + exact total. The
    stream relation must already be the token column (one row per
    occurrence)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # enforce the non-null token contract HERE rather than trusting
        # the caller: value_counts() drops nulls from the counters, so an
        # unfiltered null row would inflate the exact total and shift the
        # N/k threshold against every true heavy hitter
        summary = (
            batch.select(col)
            .filter(F.col(col).isNotNull())
            .mapInPandas(
                _mg_counting_partition(col, k), f"{col} string, cnt bigint"
            )
        )
        rows = summary.collect()  # bounded: (k+1) rows per partition
        counters, total = load_hh_state(spark, state_dir, col, before=batch_id)
        counters = merge_mg(
            counters,
            [(r[col], r["cnt"]) for r in rows if r[col] is not None],
            k,
        )
        total += sum(r["cnt"] for r in rows if r[col] is None)
        out = [(t, int(c)) for t, c in sorted(counters.items())] + [(None, total)]
        spark.createDataFrame(out, f"{col} string, cnt bigint").coalesce(
            1
        ).write.mode("overwrite").parquet(
            posixpath.join(state_dir, f"summary_b{batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", posixpath.join(state_dir, "_checkpoint")
        )
        .start()
    )


def exact_heavy_hitters_from_state(
    spark: SparkSession,
    state_dir: str,
    tokens: DataFrame,
    col: str,
    k: int,
) -> DataFrame:
    """Pass-2 exact recount of the streamed candidate set: broadcast the
    <= k candidates against the full token relation, keep cnt * k > N
    with N taken from the state's exact total (which must equal the
    relation's count — the accounting assertion rides in pytest)."""
    counters, total = load_hh_state(spark, state_dir, col)
    cands = spark.createDataFrame(
        [(t,) for t in sorted(counters)], f"{col} string"
    )
    return (
        tokens.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(total))
        .withColumn("share", F.col("cnt").cast("double") / F.lit(total))
    )
