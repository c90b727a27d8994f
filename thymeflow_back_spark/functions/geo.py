"""Geodesic / geo-URI scalar functions as JVM-side column expressions.

Reference surface: Haversine point metric
(spatial/geographic/metric/models/WGS84SphereHaversinePointMetric.scala, used
by LocationEventEnricher.scala:89-95 for the ≤1 km predicate) and geo: URI
format/parse (utils/GeoCoordinatesConverter.scala:24-60). No UDFs — pure
column arithmetic, stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (spherical earth, radius 6371 km)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


# geo:lat,lon[,alt][;u=acc]  (RFC 5870 subset, same shape the reference emits)
_GEO_RE = r"^geo:(-?[0-9.]+),(-?[0-9.]+)(?:,(-?[0-9.]+))?(?:;u=([0-9.]+))?$"


def parse_geo_uri(uri: Column) -> Column:
    """Parse a geo: URI into struct(lat, lon, alt, acc) of doubles."""
    return F.struct(
        F.regexp_extract(uri, _GEO_RE, 1).cast("double").alias("lat"),
        F.regexp_extract(uri, _GEO_RE, 2).cast("double").alias("lon"),
        F.nullif(F.regexp_extract(uri, _GEO_RE, 3), F.lit("")).cast("double").alias("alt"),
        F.nullif(F.regexp_extract(uri, _GEO_RE, 4), F.lit("")).cast("double").alias("acc"),
    )


def format_geo_uri(lat: Column, lon: Column, alt: Column | None = None, acc: Column | None = None) -> Column:
    uri = F.concat(F.lit("geo:"), lat.cast("string"), F.lit(","), lon.cast("string"))
    if alt is not None:
        uri = F.when(alt.isNotNull(), F.concat(uri, F.lit(","), alt.cast("string"))).otherwise(uri)
    if acc is not None:
        uri = F.when(acc.isNotNull(), F.concat(uri, F.lit(";u="), acc.cast("string"))).otherwise(uri)
    return uri
