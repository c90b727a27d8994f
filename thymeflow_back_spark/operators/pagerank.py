"""PageRank in exact fixed-point integer arithmetic.

Link-graph rank is a standard corpus-curation signal (domain/page
authority as a quality prior — e.g. the Common Crawl-derived pipelines
that weight sampling by harmonic/PageRank centrality). The float version
is order-sensitive (contributions sum in shuffle order), which breaks
bit-reproducibility across engines and across runs; this one does every
step in scaled BIGINT arithmetic —

    r0        = S DIV n                      (S = 10^12)
    contrib_j = r_j DIV outdeg_j             (exact integer division)
    r'_i      = (15*(S DIV n)) DIV 100 + (85 * sum(contrib_j)) DIV 100

— so each iteration is a pure integer function of the previous one,
independent of aggregation order, and DuckDB replays the identical
sequence as chained CTEs (damping 0.85 as the 85/100 rational). All
intermediates stay below 2^53, so `floor(a/b)` on doubles is exact.

Plan shape per iteration: ranks ⋈ edges on src (one shuffle, or zero if
both sides are pre-partitioned by src), groupBy dst with map-side
partial sums (the in-degree combine), left join back to the node spine
for teleport-only nodes. Iterations are a fixed count with no per-round
driver decision, so the whole chain executes lazily as ONE job (each
round's shuffle materialized once inside it); the pinned edge/node
relations are the only cached state. Dangling nodes are absent
by construction here (callers guarantee outdeg >= 1); a general caller
adds the standard dangling-mass term, one extra scalar aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # 10^12 fixed-point scale
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def _idiv(a, b):
    """Exact integer division for nonnegative operands < 2^53."""
    return F.floor(a / b).cast("bigint")


def pagerank(
    nodes: DataFrame, edges: DataFrame, iters: int = 5, n_nodes: int | None = None
) -> DataFrame:
    """Fixed-point PageRank: ``nodes(id)``, ``edges(src, dst)`` ->
    (id, rank_scaled, rank). Every node must have outdegree >= 1.

    ``n_nodes``: pass the node count if the caller already has it — it is
    only used for the teleport base, and skipping the recount saves a full
    scan of the node spine.
    """
    from .cachereg import pin

    n_row = nodes.count() if n_nodes is None else n_nodes
    base = (PR_SCALE // n_row) * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Iterations are a FIXED count with no driver-side convergence check,
    # so the whole ``iters``-round chain is built lazily and executed as
    # ONE job by the caller's action (optimization round 11, guide §2.4):
    # the former per-round eager localCheckpoint forced a full
    # materialization job every round purely to cut lineage, which a
    # 5-join linear chain does not need. Each iteration's shuffle output
    # is materialized exactly once inside the single job. The edge and
    # node relations feed every iteration — pin them (released by the
    # harness after results are collected) so they are computed once.
    e = pin(edges.join(deg, "src"))
    nodes = pin(nodes)
    ranks = nodes.select(F.col("id"), F.lit(PR_SCALE // n_row).alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.id)
            .select(e.dst.alias("id"), _idiv(F.col("r"), F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "id", "left").select(
            "id",
            (
                F.lit(base)
                + _idiv(F.lit(PR_DAMP_NUM) * F.coalesce(F.col("s"), F.lit(0)), F.lit(PR_DAMP_DEN))
            ).alias("r"),
        )
    return ranks.select(
        "id",
        F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(PR_SCALE))).alias("rank"),
    )
