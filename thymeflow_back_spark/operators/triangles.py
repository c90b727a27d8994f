"""Triangle counting and local clustering coefficients.

Triangle statistics are the standard graph-shape signal next to PageRank
(operators/pagerank.py) and connected components (operators/closure.py):
clustering coefficients feed spam/boilerplate detection on link graphs and
community-structure profiling on co-occurrence graphs (the reference's
graph layer — FlowAlgorithms/ConnectedComponents — has no triangle pass,
but any corpus-curation pipeline over a link graph wants one).

Scale design — degree-ordered orientation ("compact-forward", Latapy 2008;
the same plan GraphX's TriangleCount and most MPP engines use):

  1. Orient every undirected edge from its lower to its higher endpoint
     under the TOTAL order pi(x) = (degree(x), x). Each vertex's
     out-degree is then bounded by O(sqrt(|E|)) regardless of skew — a
     celebrity vertex with 10^8 neighbors has high IN-degree but only
     out-edges to even-better-connected vertices, of which there are few.
  2. Wedges = self-join of the oriented edges on the shared SOURCE, with
     pi(v) < pi(w) so each wedge appears once. The join fan-out per vertex
     is out-degree^2 — bounded by step 1, where the naive undirected
     wedge join is degree^2 (quadratic in the hub degree).
  3. Close wedges against the oriented edge set (equi-join on (v, w)).
     Every triangle is found EXACTLY once: its three vertices have a
     unique pi-order u < v < w, and only the wedge (u; v, w) survives.

Shuffle budget: degree aggregate, two vertex-keyed joins to attach pi,
the wedge self-join, the closing equi-join, and the final per-vertex
count — all equi-joins/aggs on vertex or edge keys, no cross products.
The degree table is vertex-sized and broadcastable when |V| is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cachereg import pin


def undirected_edges(pairs: DataFrame, u_col: str, v_col: str) -> DataFrame:
    """Canonical distinct undirected edge set (u < v) from a pair relation."""
    u, v = F.col(u_col), F.col(v_col)
    return (
        pairs.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def vertex_degrees(edges: DataFrame) -> DataFrame:
    """(id, degree) over the canonical u < v edge set."""
    ends = edges.select(F.col("u").alias("id")).unionByName(
        edges.select(F.col("v").alias("id"))
    )
    return ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))


def _oriented(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Edges oriented low-to-high under pi = (degree, id): (src, dst, ddst).

    ``ddst`` rides along so the wedge join can compare pi(v) < pi(w)
    without another degree join."""
    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("degree").alias("dv"))
    e = edges.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )


def triangles(edges: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """One row (a, b, c) per triangle in the canonical u < v edge set.

    ``deg``: pass a precomputed vertex_degrees(edges) when the caller also
    needs the degree table (clustering_coefficients does) so both consumers
    share one lineage and the exchange-reuse dedup is guaranteed rather
    than left to plan canonicalization."""
    deg = vertex_degrees(edges) if deg is None else deg
    # the oriented edge list feeds the two wedge sides AND the closing
    # join; pin it so those three consumers read one materialization
    # instead of re-running the degree joins per consumer
    o = pin(_oriented(edges, deg))
    w1 = o.select(F.col("src"), F.col("dst").alias("x"), F.col("ddst").alias("dx"))
    w2 = o.select(F.col("src"), F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    wedges = w1.join(w2, "src").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = o.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    return wedges.join(closing, ["x", "y"]).select(
        F.col("src").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
    )


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """(id, degree, triangles, clustering) per vertex of the edge set.

    clustering = 2·T / (d·(d-1)) — exact integer numerator and denominator,
    one IEEE double division, so the value is bit-reproducible on any
    engine. Degree-1 vertices get 0.0 (no possible wedge).
    """
    edges = pin(edges)  # consumed by the degree agg AND orientation
    deg = pin(vertex_degrees(edges))  # du/dv attach + final join-back
    tri = triangles(edges, deg)
    # one map-side explode instead of a three-way union — a union would
    # make `tri` a three-consumer subtree and re-run the wedge join per
    # triangle corner
    per_vertex = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(per_vertex, "id", "left").select(
        "id",
        "degree",
        F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            (2 * F.coalesce("triangles", F.lit(0))).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double")
        )
        .alias("clustering"),
    )
