"""Transitive closure / connected components as iterative DataFrame jobs.

The reference needs `personal:sameAs*` reflexive-transitive closure
(AbstractEnricher.scala:17-21, PrimaryFacetEnricher.scala:20-27) and BFS
connected components over candidate-equality graphs
(graph/ConnectedComponents.scala:9-36). In Spark both are driver-side
fixpoint loops of joins — semi-naïve (only the frontier joins each round),
with localCheckpoint every few rounds to cut lineage.

Scale: min-label propagation converges in O(diameter) rounds; sameAs-style
equivalence graphs are unions of small cliques (diameter ~2-3), so 3-5
rounds of hash joins. For adversarial long-chain graphs, switch to the
large-star/small-star algorithm (same join primitives, O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Min-label propagation: returns (node, component) — component is the
    smallest node id reachable (ids must be orderable; works for numeric or
    string ids).

    ``checkpoint_every=1``: sameAs-style graphs converge in 2-3 rounds, so
    checking after every round with flat lineage beats piling k rounds of
    nested plans between checks (measured on the IFP component query)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .dropDuplicates()
        # the edge list joins into EVERY round — materialize it once, or the
        # whole upstream pair-generation (e.g. the IFP self-join) re-executes
        # per iteration
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node"))
    )
    converged = False
    for i in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        else:
            labels = new_labels
    if not converged:
        # exit by iteration cap: silently-split components would be a wrong
        # answer, not a slow one — verify a full propagation round is a no-op
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        pending = (
            labels.join(neighbor_min, "node")
            .filter(F.col("nbr_component") < F.col("component"))
            .limit(1)
            .count()
        )
        if pending:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} "
                "iterations (component diameter exceeds the cap); raise "
                "max_iterations or use a large-star/small-star variant"
            )
    return labels


def transitive_closure(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iterations: int = 25
) -> DataFrame:
    """Reachability pairs (src, dst) under reflexive-transitive closure —
    the `p*` property-path semantics. Semi-naïve: only the last frontier
    joins the base edge set each round."""
    base = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).dropDuplicates()
    nodes = base.select("s").unionByName(base.select(F.col("d").alias("s"))).dropDuplicates()
    reach = nodes.select(F.col("s"), F.col("s").alias("d"))  # reflexive
    frontier = base
    reach = reach.unionByName(frontier).dropDuplicates()
    converged = False
    for i in range(max_iterations):
        step = (
            frontier.alias("f")
            .join(base.alias("e"), F.col("f.d") == F.col("e.s"))
            .select(F.col("f.s").alias("s"), F.col("e.d").alias("d"))
            .dropDuplicates()
        )
        new_frontier = step.join(reach, on=["s", "d"], how="left_anti").localCheckpoint(eager=True)
        if new_frontier.limit(1).count() == 0:
            converged = True
            break
        reach = reach.unionByName(new_frontier).dropDuplicates().localCheckpoint(eager=True)
        frontier = new_frontier
    if not converged:
        raise RuntimeError(
            f"transitive_closure did not converge in {max_iterations} iterations "
            "(path length exceeds the cap); raise max_iterations"
        )
    return reach.select(F.col("s").alias(src), F.col("d").alias(dst))
