"""Facebook Graph API export → quads converter.

Capability parity with the reference FacebookConverter (reference
FacebookConverter.scala:29-238; fetched by FacebookSynchronizer as one
`me` document with nested taggable_friends and events): the profile
(person, birth date, names, gender, email, bio), taggable friends, and
events with place/geo/address and attending invitees.

One JSON export file = one document graph, converted per-file inside the
binaryFile + mapInPandas scan (sources/files.py) — the per-account
document is the parallelism unit, matching the reference's one-document-
per-account delivery into the pipeline.
"""

from __future__ import annotations

import json
from datetime import datetime

from ..rdf import vocab
from ..rdf.model import XSD, XSD_DATETIME
from .common import doc_graph, mint, q

NAMESPACE = "http://graph.facebook.com/"
XSD_DATE = XSD + "date"
XSD_GYEAR = XSD + "gYear"
XSD_GMONTHDAY = XSD + "gMonthDay"


def _convert_birthday(date: str) -> tuple[str, str] | None:
    """MM/DD/YYYY → xsd:date; YYYY → xsd:gYear; MM/DD → xsd:gMonthDay
    (reference FacebookConverter.convertDate)."""
    for fmt, out, dtype in (
        ("%m/%d/%Y", "%Y-%m-%d", XSD_DATE),
        ("%Y", "%Y", XSD_GYEAR),
        ("%m/%d", "--%m-%d", XSD_GMONTHDAY),
    ):
        try:
            return datetime.strptime(date, fmt).strftime(out), dtype
        except ValueError:
            continue
    return None


def _convert_datetime(value: str) -> str | None:
    """ISO offset datetime, tolerant of +HHMM offsets and Z."""
    raw = value.strip()
    if raw.endswith("Z"):
        raw = raw[:-1] + "+00:00"
    try:
        return datetime.fromisoformat(raw).isoformat()
    except ValueError:
        return None


def _agent_quads(node: str, person: dict, g: str) -> list[tuple]:
    quads = [
        q(node, vocab.RDF_TYPE, vocab.AGENT, g, otype="iri"),
        q(node, vocab.RDF_TYPE, vocab.PERSON, g, otype="iri"),
    ]
    if person.get("name"):
        quads.append(q(node, vocab.NAME, person["name"], g))
    return quads


def _place_quads(place: dict, g: str, counter: list[int]) -> tuple[str, list[tuple]]:
    if place.get("id"):
        node = NAMESPACE + str(place["id"])
        otype = "iri"
    else:
        counter[0] += 1
        node = f"_:place{counter[0]}"
        otype = "bnode"
    quads = [q(node, vocab.RDF_TYPE, vocab.PLACE, g, otype="iri")]
    if place.get("name"):
        quads.append(q(node, vocab.NAME, place["name"], g))
    loc = place.get("location") or {}
    lat, lon = loc.get("latitude"), loc.get("longitude")
    if lat is not None and lon is not None:
        geo = f"geo:{float(lat)},{float(lon)}"
        quads += [
            q(node, vocab.GEO, geo, g, otype="iri"),
            q(geo, vocab.RDF_TYPE, vocab.GEO_COORDINATES, g, otype="iri"),
            q(geo, vocab.LATITUDE, repr(float(lat)), g, dtype=XSD + "double"),
            q(geo, vocab.LONGITUDE, repr(float(lon)), g, dtype=XSD + "double"),
        ]
    fields = [
        (loc.get("street"), vocab.STREET_ADDRESS),
        (loc.get("city"), vocab.ADDRESS_LOCALITY),
        (" ".join(v for v in (loc.get("state"), loc.get("region")) if v) or None, vocab.ADDRESS_REGION),
        (loc.get("country"), vocab.ADDRESS_COUNTRY),
        (loc.get("zip"), vocab.POSTAL_CODE),
    ]
    present = [(v, p) for v, p in fields if v]
    if present:
        addr = mint("postal-address", "|".join(f"{p}={v}" for v, p in present))
        quads.append(q(node, vocab.ADDRESS, addr, g, otype="iri"))
        quads.append(q(addr, vocab.RDF_TYPE, vocab.POSTAL_ADDRESS, g, otype="iri"))
        quads += [q(addr, p, v, g) for v, p in present]
    return node, quads


def facebook_to_quads(content: bytes, path: str) -> list[tuple]:
    """Graph API `me` export JSON → quads (one document graph per export)."""
    try:
        me = json.loads(content.decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        return []
    if not isinstance(me, dict) or "id" not in me:
        return []
    g = doc_graph(path)
    counter = [0]
    me_node = NAMESPACE + str(me["id"])
    quads = _agent_quads(me_node, {}, g)
    if me.get("birthday"):
        conv = _convert_birthday(me["birthday"])
        if conv:
            quads.append(q(me_node, vocab.BIRTH_DATE, conv[0], g, dtype=conv[1]))
    for key, pred in (
        ("first_name", vocab.GIVEN_NAME),
        ("last_name", vocab.FAMILY_NAME),
        ("gender", vocab.SCHEMA + "gender"),
        ("bio", vocab.SCHEMA + "description"),
    ):
        if me.get(key):
            quads.append(q(me_node, pred, me[key], g))
    if me.get("email"):
        addr = me["email"].strip().lower()
        mailto = f"mailto:{addr}"
        quads += [
            q(me_node, vocab.EMAIL, mailto, g, otype="iri"),
            q(mailto, vocab.RDF_TYPE, vocab.EMAIL_ADDRESS, g, otype="iri"),
            q(mailto, vocab.NAME, addr, g),
        ]

    for friend in (me.get("taggable_friends") or {}).get("data", []):
        fnode = NAMESPACE + str(friend["id"])
        quads += _agent_quads(fnode, friend, g)
        url = ((friend.get("picture") or {}).get("data") or {}).get("url")
        if url:
            quads.append(q(fnode, vocab.SCHEMA + "image", url, g, otype="iri"))
            quads.append(q(fnode, vocab.RDF_TYPE, vocab.SCHEMA + "ImageObject", g, otype="iri"))

    for event in (me.get("events") or {}).get("data", []):
        enode = NAMESPACE + str(event["id"])
        quads.append(q(enode, vocab.RDF_TYPE, vocab.EVENT, g, otype="iri"))
        for key, pred in (("name", vocab.NAME), ("description", vocab.SCHEMA + "description")):
            if event.get(key):
                quads.append(q(enode, pred, event[key], g))
        for key, pred in (("start_time", vocab.START_DATE), ("end_time", vocab.END_DATE)):
            if event.get(key):
                conv = _convert_datetime(event[key])
                if conv:
                    quads.append(q(enode, pred, conv, g, dtype=XSD_DATETIME))
        if event.get("place"):
            pnode, pquads = _place_quads(event["place"], g, counter)
            quads += pquads
            quads.append(q(enode, vocab.LOCATION, pnode, g, otype="iri" if not pnode.startswith("_:") else "bnode"))
        for invitee in (event.get("invited") or {}).get("data", []):
            inode = NAMESPACE + str(invitee["id"])
            quads += _agent_quads(inode, invitee, g)
            if invitee.get("rsvp_status") == "attending":
                quads.append(q(enode, vocab.ATTENDEE, inode, g, otype="iri"))
    return quads
