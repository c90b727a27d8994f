"""Rank fusion for hybrid retrieval (lexical + semantic serving).

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009): fuse m ranked
lists by score(d) = Σ_lists 1/(k0 + rank_d). The production hybrid-search
combiner — BM25 candidates and embedding-ANN candidates merged without
score calibration.

Engine-reproducibility: the canonical formula sums floats whose result
depends on accumulation order once m > 2. We quantize each contribution to
an INTEGER — floor(SCALE / (k0 + rank)) with SCALE = 10^12 — so the fused
score is an exact bigint sum (order-free, overflow-safe: even 10^6 lists
of rank 1 stay < 2^63) and only the final presentation divides back to a
double. The quantization error is < 1e-12 per list — far below any rank
boundary RRF cares about — and buys bit-identical fusion on any engine,
partitioning, or list order.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K0 = 60  # the constant from the RRF paper
RRF_SCALE = 10**12


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    n: int,
    k0: int = RRF_K0,
) -> DataFrame:
    """Fuse ranked lists into (id, rrf_score, n_lists, fused_rank), top ``n``.

    Each input must expose ``id_col`` and an integer ``rank`` column
    (1-based). Ids missing from a list contribute nothing for it. Ties on
    the fused score break to the smallest id. Plan: map-side contribution
    projections, one union, one groupBy(id) with partial aggregation, and
    a TakeOrderedAndProject top-n — never a global sort.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    contribs = [
        r.select(
            F.col(id_col),
            F.expr(f"{RRF_SCALE} DIV ({k0} + rank)").cast("bigint").alias("__c"),
        )
        for r in rankings
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = unioned.groupBy(id_col).agg(
        F.sum("__c").alias("__s"), F.count("*").alias("n_lists")
    )
    top = fused.orderBy(F.desc("__s"), F.col(id_col)).limit(n)
    # rank-after-limit: the unpartitioned window runs over n rows only
    return (
        top.withColumn(
            "fused_rank",
            F.row_number().over(Window.orderBy(F.desc("__s"), F.col(id_col))),
        )
        .select(
            id_col,
            (F.col("__s") / F.lit(float(RRF_SCALE))).alias("rrf_score"),
            "n_lists",
            "fused_rank",
        )
    )
