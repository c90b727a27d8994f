"""iCalendar → quads converter.

Capability parity with the reference's ICalConverter (SURVEY.md §2.1):
VEVENT → schema:Event with start/end (date or dateTime), DURATION as
xsd:dayTimeDuration, LOCATION → Place, GEO → GeoCoordinates, ATTENDEE /
ORGANIZER mailto agents. Tolerant hand parser (RFC 5545 subset).
"""

from __future__ import annotations

import re

from ..rdf import vocab
from ..rdf.model import XSD_DATETIME
from .common import doc_graph, mint, parse_prop, q, unfold_lines

XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"
XSD_DAYTIME_DURATION = "http://www.w3.org/2001/XMLSchema#dayTimeDuration"


def _dt_literal(value: str) -> tuple[str, str]:
    v = value.strip()
    m = re.match(r"^(\d{4})(\d{2})(\d{2})T(\d{2})(\d{2})(\d{2})(Z?)$", v)
    if m:
        y, mo, d, h, mi, s, z = m.groups()
        suffix = "+00:00" if z else ""
        return f"{y}-{mo}-{d}T{h}:{mi}:{s}{suffix}", XSD_DATETIME
    m = re.match(r"^(\d{4})(\d{2})(\d{2})$", v)
    if m:
        return "-".join(m.groups()), XSD_DATE
    return v, XSD_DATETIME


def _split_events(lines: list[str]) -> list[list[str]]:
    events: list[list[str]] = []
    current: list[str] | None = None
    for line in lines:
        upper = line.strip().upper()
        if upper == "BEGIN:VEVENT":
            current = []
        elif upper == "END:VEVENT":
            if current is not None:
                events.append(current)
            current = None
        elif current is not None:
            current.append(line)
    return events


def _agent(value: str, params: dict[str, str], g: str) -> tuple[str | None, list[tuple]]:
    addr = value.strip()
    if addr.lower().startswith("mailto:"):
        addr = addr[7:]
    if "@" not in addr:
        return None, []
    addr = addr.lower()
    agent = mint("agent", addr)
    quads = [
        q(agent, vocab.RDF_TYPE, vocab.AGENT, g, otype="iri"),
        q(agent, vocab.EMAIL, f"mailto:{addr}", g, otype="iri"),
    ]
    cn = params.get("CN")
    if cn and cn.lower() != addr:
        quads.append(q(agent, vocab.NAME, cn.strip('"'), g))
    return agent, quads


def ical_to_quads(content: bytes, path: str) -> list[tuple]:
    text = content.decode("utf-8", errors="replace")
    g = doc_graph(path)
    quads: list[tuple] = []
    for idx, ev_lines in enumerate(_split_events(unfold_lines(text))):
        props = [p for p in (parse_prop(line) for line in ev_lines) if p]
        by_name: dict[str, list[tuple[dict, str]]] = {}
        for name, params, value in props:
            by_name.setdefault(name, []).append((params, value))

        uid = by_name.get("UID", [({}, "")])[0][1].strip()
        ev = f"urn:event:{uid}" if uid else mint("event", f"{path}#{idx}")
        quads.append(q(ev, vocab.RDF_TYPE, vocab.EVENT, g, otype="iri"))

        for _, v in by_name.get("SUMMARY", []):
            quads.append(q(ev, vocab.NAME, v.strip().replace("\\,", ","), g))
        for prop, pred in (("DTSTART", vocab.START_DATE), ("DTEND", vocab.END_DATE)):
            for _, v in by_name.get(prop, []):
                lex, dtype = _dt_literal(v)
                quads.append(q(ev, pred, lex, g, dtype=dtype))
        for _, v in by_name.get("DURATION", []):
            quads.append(q(ev, vocab.DURATION, v.strip(), g, dtype=XSD_DAYTIME_DURATION))
        for _, v in by_name.get("LOCATION", []):
            name = v.strip().replace("\\,", ",").replace("\\n", " ")
            if name:
                place = mint("place", name.lower())
                quads.append(q(ev, vocab.LOCATION, place, g, otype="iri"))
                quads.append(q(place, vocab.RDF_TYPE, vocab.PLACE, g, otype="iri"))
                quads.append(q(place, vocab.NAME, name, g))
        for _, v in by_name.get("GEO", []):
            m = re.match(r"^(-?[\d.]+);(-?[\d.]+)$", v.strip())
            if m:
                geo = mint("geo", v.strip())
                quads.append(q(ev, vocab.PERSONAL + "geo", geo, g, otype="iri"))
                quads.append(q(geo, vocab.RDF_TYPE, vocab.GEO_COORDINATES, g, otype="iri"))
                quads.append(
                    q(geo, vocab.LATITUDE, m.group(1), g, dtype="http://www.w3.org/2001/XMLSchema#double")
                )
                quads.append(
                    q(geo, vocab.LONGITUDE, m.group(2), g, dtype="http://www.w3.org/2001/XMLSchema#double")
                )
        for params, v in by_name.get("ORGANIZER", []):
            agent, aq = _agent(v, params, g)
            if agent:
                quads.extend(aq)
                quads.append(q(ev, vocab.ORGANIZER, agent, g, otype="iri"))
        for params, v in by_name.get("ATTENDEE", []):
            agent, aq = _agent(v, params, g)
            if agent:
                quads.extend(aq)
                quads.append(q(ev, vocab.ATTENDEE, agent, g, otype="iri"))
    return quads


# --- write-back: apply a diff onto iCalendar text -----------------------------
# (reference ICalConverter applyDiff, used by CalDavSynchronizer's PUT path
# — BaseDavSynchronizer.scala:223-240)

_ICAL_DT_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\+00:00|Z)?$")


def _dt_ical(lexical: str) -> str | None:
    """xsd:dateTime/date lexical → iCal basic format (inverse of _dt_literal)."""
    m = _ICAL_DT_RE.match(lexical.strip())
    if m:
        y, mo, d, h, mi, s = m.groups()
        return f"{y}{mo}{d}T{h}{mi}{s}Z"
    m = re.match(r"^(\d{4})-(\d{2})-(\d{2})$", lexical.strip())
    if m:
        return "".join(m.groups())
    return None


def _ical_line_for_add(p: str, o: str) -> str | None:
    if p == vocab.NAME:
        return "SUMMARY:" + o.replace(",", "\\,")
    if p in (vocab.START_DATE, vocab.END_DATE):
        dt = _dt_ical(o)
        if dt is None:
            return None
        return ("DTSTART:" if p == vocab.START_DATE else "DTEND:") + dt
    if p == vocab.DURATION:
        return f"DURATION:{o}"
    if p == vocab.URL:
        return f"URL:{o}"
    return None


def _ical_line_matches_removal(name: str, value: str, p: str, o: str) -> bool:
    if p == vocab.NAME:
        return name == "SUMMARY" and value.strip().replace("\\,", ",") == o
    if p == vocab.START_DATE:
        return name == "DTSTART"
    if p == vocab.END_DATE:
        return name == "DTEND"
    if p == vocab.DURATION:
        return name == "DURATION" and value.strip() == o
    if p == vocab.URL:
        return name == "URL" and value.strip() == o
    return False


def ical_apply_diff(
    text: str, added: list[tuple[str, str, str]], removed: list[tuple[str, str, str]]
) -> tuple[str, dict[str, list[tuple]]]:
    """Apply (subject, predicate, object) adds/removes onto iCalendar text.

    Events are matched by UID (the urn:event:<uid> minting of
    ical_to_quads). Supported properties: SUMMARY, DTSTART, DTEND,
    DURATION, URL; anything else is rejected (ConverterException parity) so
    the Updater routes it to negations / the user graph. Removals run
    before adds — an edit delivered as remove+add is a replacement."""
    lines = unfold_lines(text)
    # split into alternating wrapper/vevent segments, preserving wrapper text
    segments: list[tuple[str, list[str]]] = []
    current: list[str] = []
    kind = "other"
    for line in lines:
        upper = line.strip().upper()
        if upper == "BEGIN:VEVENT":
            segments.append((kind, current))
            current, kind = [], "vevent"
        elif upper == "END:VEVENT":
            segments.append((kind, current))
            current, kind = [], "other"
        else:
            current.append(line)
    segments.append((kind, current))

    def event_iri(ev_lines: list[str]) -> str:
        for line in ev_lines:
            prop = parse_prop(line)
            if prop and prop[0] == "UID":
                return f"urn:event:{prop[2].strip()}"
        return ""

    applied: list[tuple] = []
    rejected: list[tuple] = []
    out_segments = [(k, list(ls)) for k, ls in segments]

    for s, p, o in removed:
        matched = False
        found_event = False
        for k, ls in out_segments:
            if k != "vevent" or event_iri(ls) != s:
                continue
            found_event = True
            kept = []
            for line in ls:
                prop = parse_prop(line)
                if prop and _ical_line_matches_removal(prop[0], prop[2], p, o):
                    matched = True
                    continue
                kept.append(line)
            ls[:] = kept
        if found_event and matched:
            applied.append((s, p, o, "remove"))
        else:
            # unknown event subject or no matching line: reject so
            # write_back fails and the updater reroutes the statement
            rejected.append((s, p, o, "remove"))

    for s, p, o in added:
        for k, ls in out_segments:
            if k != "vevent" or event_iri(ls) != s:
                continue
            line = _ical_line_for_add(p, o)
            if line is None:
                rejected.append((s, p, o, "add"))
            else:
                ls.append(line)
                applied.append((s, p, o, "add"))
            break
        else:
            # subject is not an event in this resource: reject (the
            # reference raises ConverterException; silently skipping would
            # lose the statement on the next idempotent re-delivery)
            rejected.append((s, p, o, "add"))

    parts: list[str] = []
    for k, ls in out_segments:
        if k == "vevent":
            parts.append("BEGIN:VEVENT")
            parts.extend(ls)
            parts.append("END:VEVENT")
        else:
            parts.extend(ls)
    return "\n".join(parts) + "\n", {"applied": applied, "rejected": rejected}
