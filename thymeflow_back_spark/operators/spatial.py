"""Grid-cell-blocked spatial self-join: all point pairs within a radius.

The scale-correct form of "which points are near each other": snap every
point to a square grid whose cell edge is >= the search radius, replicate
ONE side of the join to its cell plus the 8 neighbors, and equi-join on the
cell id — every true pair meets in exactly one (cell_of_a == replica_of_b)
combination, so no dropDuplicates pass is needed. The exact haversine
predicate then prunes the candidates. Work is O(points x local density),
never O(n²): a corpus-wide cross product (the naive formulation) is
replaced by a 9x replication of one side and a single equi-join shuffle —
the same blocking discipline as the dedup shingle joins
(operators/dedup.py) applied to space instead of text.

The reference's spatial predicates are pairwise distance tests inside
enrichers (WGS84SphereHaversinePointMetric via LocationStayEnricher /
LocationEventEnricher); this operator is their corpus-scale join form.

Projection note: cells are computed on a fixed-center equirectangular
projection (lon·111320·cos(ref_lat), lat·110574). The projection only
BLOCKS — candidate completeness needs cell_edge >= radius under worst-case
local distortion, which ``cell_factor=2`` covers for mid-latitude boxes;
the DISTANCE predicate itself is true haversine, so no false positives
survive regardless of projection error.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_m

M_PER_DEG_LAT = 110574.0
M_PER_DEG_LON_EQ = 111320.0


def within_distance_pairs(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_m: float,
    ref_lat_deg: float,
    cell_factor: float = 2.0,
    dist_decimals: int = 3,
) -> DataFrame:
    """(a_id, b_id, dist_m) for all unordered pairs with haversine distance
    <= ``radius_m``; a_id < b_id; dist_m rounded to ``dist_decimals``.

    ``ref_lat_deg`` anchors the lon->meters scale (pass the center of the
    data's latitude band; only blocking granularity depends on it).
    """
    cell = cell_factor * radius_m
    x = F.col(lon_col) * (M_PER_DEG_LON_EQ * math.cos(math.radians(ref_lat_deg)))
    y = F.col(lat_col) * M_PER_DEG_LAT
    base = points.select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        F.floor(x / cell).alias("cx"),
        F.floor(y / cell).alias("cy"),
    )
    a = base.select(
        F.col("pid").alias("a_id"), F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"), "cx", "cy",
    )
    offsets = F.expr(
        "flatten(transform(sequence(-1, 1), dx ->"
        " transform(sequence(-1, 1), dy -> struct(dx as dx, dy as dy))))"
    )
    b = (
        base.withColumn("o", F.explode(offsets))
        .select(
            F.col("pid").alias("b_id"), F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
        )
    )
    dist = haversine_m(F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon"))
    return (
        a.join(b, ["cx", "cy"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("dist_m", F.round(dist, dist_decimals))
        .filter(F.col("dist_m") <= radius_m)
        .select("a_id", "b_id", "dist_m")
    )
