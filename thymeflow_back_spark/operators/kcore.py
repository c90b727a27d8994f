"""k-core peeling (bounded-round) over an undirected edge set.

The k-core — the maximal subgraph where every vertex keeps degree >= k —
is the classic density filter on link/co-occurrence graphs (spam farms and
boilerplate rings survive high-k cores; long-tail pages peel off early),
complementing PageRank (authority) and clustering coefficients (local
shape) in the corpus-curation graph suite.

The algorithm is iterative peeling: drop every vertex whose degree within
the surviving subgraph is < k, recompute, repeat. This implementation runs
a FIXED number of rounds rather than loop-until-converged: after the
fixpoint every further round is a no-op, so for any R >= the convergence
round count the output IS the k-core, and a fixed R makes the computation
a pure function replayable as chained CTEs on any engine (the same
bounded-iteration discipline as operators/pagerank.py — convergence within
R is asserted in pytest, and the returned ``peel_round`` column makes a
non-converged run visible: round R peels would show up at value R).

Output is the onion view, one row per vertex: ``peel_round`` = the round
(1-based) at which the vertex was removed, 0 for k-core survivors.

Plan shape per round: a degree aggregate over surviving edges (map-side
combined, vertex-keyed) and two semi-joins to drop dead endpoints — all
equi-shuffles on vertex id; each round's survivor set is persisted +
localCheckpointed to cut lineage exactly like the closure/PageRank loops.
Edges only shrink, so round cost is monotonically decreasing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Peel ``edges`` (canonical u < v rows) for ``rounds`` rounds at
    threshold ``k``: (id, peel_round) with 0 = still in the k-core."""
    verts = (
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .distinct()
    )
    result = verts.withColumn("peel_round", F.lit(0)).localCheckpoint(eager=True)
    live = edges.localCheckpoint(eager=True)
    for r in range(1, rounds + 1):
        deg = (
            live.select(F.col("u").alias("id"))
            .unionByName(live.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # survivors of this round: degree >= k among live edges (vertices
        # that already lost ALL edges are absent from deg — they peel too).
        # Materialize: alive feeds THREE consumers per round (the dead
        # check, the result update, and both live semi-joins) — without
        # the checkpoint each one re-runs the shuffled degree aggregate.
        alive = (
            deg.filter(F.col("d") >= k).select("id").localCheckpoint(eager=True)
        )
        dead = (
            result.filter(F.col("peel_round") == 0)
            .join(alive, "id", "left_anti")
            .select("id")
        )
        if dead.isEmpty():
            break
        result = (
            result.join(dead.withColumn("__r", F.lit(r)), "id", "left")
            .select(
                "id",
                F.when(
                    (F.col("peel_round") == 0) & F.col("__r").isNotNull(), F.col("__r")
                )
                .otherwise(F.col("peel_round"))
                .alias("peel_round"),
            )
            .localCheckpoint(eager=True)
        )
        live = (
            live.join(alive.select(F.col("id").alias("u")), "u", "left_semi")
            .join(alive.select(F.col("id").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    return result
