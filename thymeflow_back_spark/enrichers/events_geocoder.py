"""EventsWithStaysGeocoderEnricher: geocode event places biased by the
stays that overlap the event in time.

Parity with reference EventsWithStaysGeocoderEnricher.scala:49-98: an
event whose ``schema:location`` place carries a name but NO coordinates is
geocoded with the location bias of a ``personal:Stay`` overlapping the
event's time window (the user was demonstrably near the venue). One
geocoder feature → the place's address quads go to the certain output
graph; several → the uncertain graph (the reference's certain/uncertain
split, PlacesGeocoderEnricher.scala:71-94 shares the convention).

Plan shape: property-table extraction (pattern scans), a bucketized
interval-overlap join events×stays (operators/interval_join.py — no cross
product), top-1 stay per event by overlap length (window rank), then the
cache-fronted geocoder join; only cache MISSES touch the external fetch,
executor-side. Scales like the location-event matcher plus one geocode
per distinct (name, rounded-bias) query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..geocoding.geocoder import CachedGeocoder
from ..rdf import vocab
from ..rdf.model import QUAD_COLUMNS, XSD_DOUBLE
from ..rdf.store import Diff, StatementStore
from .location_events import _interval_entities

OUTPUT_GRAPH = "urn:graph:eventsWithStaysGeocoderEnricher"
UNCERTAIN_GRAPH = OUTPUT_GRAPH + ":uncertain"


def _event_places_without_geo(quads: DataFrame) -> DataFrame:
    """(event_id, place, place_name) for event locations lacking geo."""
    ev_loc = quads.filter(F.col("predicate") == vocab.LOCATION).select(
        F.col("subject").alias("event_id"), F.col("object_value").alias("place")
    )
    names = quads.filter(F.col("predicate") == vocab.NAME).select(
        F.col("subject").alias("place"), F.col("object_value").alias("place_name")
    )
    has_geo = quads.filter(F.col("predicate") == vocab.GEO).select(
        F.col("subject").alias("place")
    )
    return (
        ev_loc.join(names, "place")
        .join(has_geo, "place", "left_anti")
        .dropDuplicates(["event_id", "place"])
    )


def events_with_stays_geocoder_enricher(
    store: StatementStore, diff: Diff, geocoder: CachedGeocoder
) -> Diff:
    quads = store.quads
    empty = quads.limit(0)

    # trigger guard: only run when the diff delivered events or stays
    touched = diff.added.filter(
        (F.col("predicate") == vocab.RDF_TYPE)
        & (F.col("object_value").isin(vocab.EVENT, vocab.STAY))
    )
    if not touched.limit(1).count():
        return Diff(added=empty, removed=empty)

    events = _interval_entities(quads, vocab.EVENT, "e")
    stays = _interval_entities(quads, vocab.STAY, "s").filter(
        F.col("s_lat").isNotNull() & F.col("s_lon").isNotNull()
    )
    places = _event_places_without_geo(quads)
    if not places.limit(1).count():
        return Diff(added=empty, removed=empty)

    from ..operators.interval_join import interval_overlap_join

    ev = events.join(places, events["e_id"] == places["event_id"]).select(
        "e_id", "e_start_us", "e_end_us", "place", "place_name"
    )
    pairs = interval_overlap_join(
        ev,
        stays,
        left_start="e_start_us",
        left_end="e_end_us",
        right_start="s_start_us",
        right_end="s_end_us",
        on=[],
    )
    overlap = F.least(F.col("e_end_us"), F.col("s_end_us")) - F.greatest(
        F.col("e_start_us"), F.col("s_start_us")
    )
    best = (
        pairs.withColumn("overlap_us", overlap)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("e_id", "place").orderBy(
                    F.desc("overlap_us"), F.asc("s_id")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        # one bias per place, picked deterministically (largest overlap,
        # then smallest event id) — dropDuplicates would keep an arbitrary
        # row and make the certain/uncertain outcome vary across runs
        .withColumn(
            "place_rk",
            F.row_number().over(
                Window.partitionBy("place").orderBy(F.desc("overlap_us"), F.asc("e_id"))
            ),
        )
        .filter(F.col("place_rk") == 1)
        # bias rounded to ~1 km so nearby stays share one cache entry
        .withColumn("bias_lon", F.round(F.col("s_lon"), 2))
        .withColumn("bias_lat", F.round(F.col("s_lat"), 2))
        .select("place", "place_name", "bias_lon", "bias_lat")
    )

    queries = best.select(
        F.lit("direct_bias").alias("kind"),
        F.concat_ws(
            "|", F.col("place_name"), F.concat_ws(",", "bias_lon", "bias_lat")
        ).alias("query"),
    )
    resolved = geocoder.lookup_batch(queries)

    feat_schema = "array<struct<name:string,lon:double,lat:double,house_number:string,street:string,locality:string,postal_code:string,region:string,country:string>>"
    joined = (
        best.withColumn(
            "query",
            F.concat_ws("|", F.col("place_name"), F.concat_ws(",", "bias_lon", "bias_lat")),
        )
        .join(resolved.filter(F.col("kind") == "direct_bias"), "query")
        .withColumn("feats", F.from_json("features", feat_schema))
        .filter(F.size("feats") > 0)
        .withColumn("feature", F.col("feats")[0])
        .withColumn(
            "graph",
            F.when(F.size("feats") == 1, F.lit(OUTPUT_GRAPH)).otherwise(
                F.lit(UNCERTAIN_GRAPH)
            ),
        )
        .select("place", "feature", "graph")
    )

    geo_node = F.concat(
        F.lit("geo:"), F.col("feature.lat"), F.lit(","), F.col("feature.lon")
    )

    def quad(s, p, o, otype, dtype=None):
        return joined.select(
            s.alias("subject"),
            F.lit(p).alias("predicate"),
            o.cast("string").alias("object_value"),
            F.lit(otype).alias("object_type"),
            F.lit(dtype).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.col("graph"),
        )

    added = (
        quad(F.col("place"), vocab.GEO, geo_node, "iri")
        .unionByName(quad(geo_node, vocab.RDF_TYPE, F.lit(vocab.GEO_COORDINATES), "iri"))
        .unionByName(quad(geo_node, vocab.LATITUDE, F.col("feature.lat"), "literal", XSD_DOUBLE))
        .unionByName(quad(geo_node, vocab.LONGITUDE, F.col("feature.lon"), "literal", XSD_DOUBLE))
        .select(*QUAD_COLUMNS)
    )
    return Diff(added=added.dropDuplicates(), removed=empty)
