"""vCard → quads converter, and the diff write-back inverse.

Capability parity with the reference's VCardConverter (SURVEY.md §2.1;
VCardConverter.scala:42-260): FN/N (incl. honorific prefixes/suffixes) /
NICKNAME, BDAY (with the year-1970 "no year" convention mapped to an
xsd:gMonthDay literal), ADR → PostalAddress node + country→region→locality
place-hierarchy chain (PostalAddressConverter.scala:18-60), EMAIL → mailto
IRI, TEL → E.164 tel: IRI with cellphone classing (PhoneNumberConverter
semantics, functions/phone.py), ORG, URL. ``vcard_apply_diff`` is the
write-back inverse (VCardConverter.scala:278-395): a StatementSetDiff
scoped to a card's graph is applied onto the vCard TEXT, producing the new
.vcf to PUT back to CardDAV. Tolerant hand parser (RFC 6350 subset) — no
external vcard library in the runtime.
"""

from __future__ import annotations

import re

from ..functions.phone import display_phone, normalize_phone, phone_class
from ..rdf import vocab
from ..rdf.model import XSD_STRING
from .common import doc_graph, mint, parse_prop, q, unfold_lines

XSD_GMONTHDAY = "http://www.w3.org/2001/XMLSchema#gMonthDay"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"


def _tel_uri(value: str) -> str | None:
    return normalize_phone(value)


def _bday_literal(value: str) -> tuple[str, str]:
    """BDAY → (lexical, datatype). Year 1970 means 'year unknown' → gMonthDay."""
    m = re.match(r"^(\d{4})-?(\d{2})-?(\d{2})$", value.strip())
    if not m:
        return value.strip(), XSD_STRING
    year, month, day = m.groups()
    if year == "1970":
        return f"--{month}-{day}", XSD_GMONTHDAY
    return f"{year}-{month}-{day}", XSD_DATE


def _split_records(lines: list[str]) -> list[list[str]]:
    records: list[list[str]] = []
    current: list[str] | None = None
    for line in lines:
        upper = line.strip().upper()
        if upper == "BEGIN:VCARD":
            current = []
        elif upper == "END:VCARD":
            if current is not None:
                records.append(current)
            current = None
        elif current is not None:
            current.append(line)
    return records


def vcard_to_quads(content: bytes, path: str) -> list[tuple]:
    text = content.decode("utf-8", errors="replace")
    g = doc_graph(path)
    quads: list[tuple] = []
    for idx, record in enumerate(_split_records(unfold_lines(text))):
        props = [p for p in (parse_prop(line) for line in record) if p]
        by_name: dict[str, list[tuple[dict, str]]] = {}
        for name, params, value in props:
            by_name.setdefault(name, []).append((params, value))

        uid = by_name.get("UID", [({}, "")])[0][1].strip()
        card = f"urn:contact:{uid}" if uid else mint("contact", f"{path}#{idx}")
        quads.append(q(card, vocab.RDF_TYPE, vocab.PERSON, g, otype="iri"))

        for _, v in by_name.get("FN", []):
            quads.append(q(card, vocab.NAME, v.strip(), g))
        for _, v in by_name.get("NICKNAME", []):
            for nick in v.split(","):
                quads.append(q(card, vocab.NICKNAME, nick.strip(), g))
        for _, v in by_name.get("N", []):
            parts = v.split(";")
            for i, pred in enumerate(
                (
                    vocab.FAMILY_NAME,
                    vocab.GIVEN_NAME,
                    vocab.ADDITIONAL_NAME,
                    vocab.HONORIFIC_PREFIX,
                    vocab.HONORIFIC_SUFFIX,
                )
            ):
                if i < len(parts) and parts[i].strip():
                    quads.append(q(card, pred, parts[i].strip(), g))
        for _, v in by_name.get("BDAY", []):
            lex, dtype = _bday_literal(v)
            quads.append(q(card, vocab.BIRTH_DATE, lex, g, dtype=dtype))
        for _, v in by_name.get("EMAIL", []):
            mailto = f"mailto:{v.strip().lower()}"
            quads.append(q(card, vocab.EMAIL, mailto, g, otype="iri"))
            quads.append(q(mailto, vocab.RDF_TYPE, vocab.EMAIL_ADDRESS, g, otype="iri"))
        for params, v in by_name.get("TEL", []):
            tel = _tel_uri(v)
            if tel is None:
                continue  # invalid numbers are logged-and-dropped upstream
            quads.append(q(card, vocab.TELEPHONE, tel, g, otype="iri"))
            quads.append(q(tel, vocab.RDF_TYPE, vocab.PHONE_NUMBER, g, otype="iri"))
            cls = phone_class(params.get("TYPE"))
            if cls != vocab.PHONE_NUMBER:
                quads.append(q(tel, vocab.RDF_TYPE, cls, g, otype="iri"))
            quads.append(q(tel, vocab.NAME, display_phone(tel), g))
        for _, v in by_name.get("URL", []):
            quads.append(q(card, vocab.URL, v.strip(), g, otype="iri"))
        for _, v in by_name.get("ORG", []):
            quads.append(q(card, vocab.PERSONAL + "organization", v.split(";")[0].strip(), g))
        for adr_idx, (_, v) in enumerate(by_name.get("ADR", [])):
            parts = (v.split(";") + [""] * 7)[:7]
            addr = mint("address", f"{card}#{adr_idx}:{v}")
            quads.append(q(card, vocab.ADDRESS, addr, g, otype="iri"))
            quads.append(q(addr, vocab.RDF_TYPE, vocab.POSTAL_ADDRESS, g, otype="iri"))
            for val, pred in (
                (parts[2], vocab.STREET_ADDRESS),
                (parts[5], vocab.POSTAL_CODE),
            ):
                if val.strip():
                    quads.append(q(addr, pred, val.strip(), g))
            quads += _address_hierarchy(
                addr,
                g,
                country=parts[6].strip() or None,
                region=parts[4].strip() or None,
                locality=parts[3].strip() or None,
            )
    return quads


def _address_hierarchy(
    addr: str, g: str, country: str | None, region: str | None, locality: str | None
) -> list[tuple]:
    """country→region→locality Place chain (PostalAddressConverter.scala:
    22-50): each component is a Place NODE (deterministically minted,
    scoped under its parent) linked by containedInPlace, and the address
    points at the node — not a bare string — so two contacts in the same
    city share one locality node."""
    quads: list[tuple] = []
    country_node = region_node = None
    if country:
        country_node = mint("place", f"country:{country}")
        quads += [
            q(addr, vocab.ADDRESS_COUNTRY, country_node, g, otype="iri"),
            q(country_node, vocab.RDF_TYPE, vocab.COUNTRY, g, otype="iri"),
            q(country_node, vocab.RDF_TYPE, vocab.PLACE, g, otype="iri"),
            q(country_node, vocab.NAME, country, g),
        ]
    if region:
        scope = f"{country_node}/" if country_node else ""
        region_node = mint("place", f"{scope}region:{region}")
        quads += [
            q(addr, vocab.ADDRESS_REGION, region_node, g, otype="iri"),
            q(region_node, vocab.RDF_TYPE, vocab.PLACE, g, otype="iri"),
            q(region_node, vocab.NAME, region, g),
        ]
        if country_node:
            quads.append(q(region_node, vocab.CONTAINED_IN_PLACE, country_node, g, otype="iri"))
    if locality:
        parent = region_node or country_node
        scope = f"{parent}/" if parent else ""
        locality_node = mint("place", f"{scope}locality:{locality}")
        quads += [
            q(addr, vocab.ADDRESS_LOCALITY, locality_node, g, otype="iri"),
            q(locality_node, vocab.RDF_TYPE, vocab.PLACE, g, otype="iri"),
            q(locality_node, vocab.NAME, locality, g),
        ]
        for parent_node in (region_node, country_node):
            if parent_node:
                quads.append(q(locality_node, vocab.CONTAINED_IN_PLACE, parent_node, g, otype="iri"))
    return quads


# --- write-back: apply a diff onto vCard text (VCardConverter.scala:278-395) --

# predicate → vCard property writer/matcher
_SIMPLE_PROPS = {
    vocab.NAME: "FN",
    vocab.NICKNAME: "NICKNAME",
    vocab.URL: "URL",
}


def _property_lines_for_add(p: str, o: str) -> str | None:
    if p in _SIMPLE_PROPS:
        return f"{_SIMPLE_PROPS[p]}:{o}"
    if p == vocab.EMAIL:
        return f"EMAIL:{o.removeprefix('mailto:')}"
    if p == vocab.TELEPHONE:
        return f"TEL;VALUE=uri:{o}"
    if p == vocab.BIRTH_DATE:
        if o.startswith("--"):  # gMonthDay → year-1970 convention
            return f"BDAY:1970-{o[2:]}"
        return f"BDAY:{o}"
    return None


def _line_matches_removal(name: str, params: dict, value: str, p: str, o: str) -> bool:
    if p in _SIMPLE_PROPS:
        return name == _SIMPLE_PROPS[p] and value.strip() == o
    if p == vocab.EMAIL:
        return name == "EMAIL" and value.strip().lower() == o.removeprefix("mailto:")
    if p == vocab.TELEPHONE:
        return name == "TEL" and normalize_phone(value) == o
    if p == vocab.BIRTH_DATE:
        return name == "BDAY"
    return False


def vcard_apply_diff(
    text: str, added: list[tuple[str, str, str]], removed: list[tuple[str, str, str]]
) -> tuple[str, dict[str, list[tuple]]]:
    """Apply (subject, predicate, object) adds/removes onto vCard text.

    Returns (new_text, results) with results['applied'] / ['rejected'].
    Statements whose subject is not a card in this file are REJECTED, as are
    unsupported predicates (ConverterException parity — the reference raises
    so the Updater reroutes them to negations / the user graph; silently
    skipping would let the next idempotent re-delivery erase them).
    Removals run before adds, so an edit delivered as remove+add lands as a
    replacement."""
    lines = unfold_lines(text)
    records = _split_records(lines)
    applied: list[tuple] = []
    rejected: list[tuple] = []

    # map card IRI -> record index (same minting as vcard_to_quads)
    out_records: list[list[str]] = []
    card_iris: list[str] = []
    for idx, record in enumerate(records):
        uid = ""
        for line in record:
            prop = parse_prop(line)
            if prop and prop[0] == "UID":
                uid = prop[2].strip()
        card_iris.append(f"urn:contact:{uid}" if uid else "")
        out_records.append(list(record))

    def find_record(subject: str) -> int | None:
        for i, iri in enumerate(card_iris):
            if iri and iri == subject:
                return i
        return None

    for s, p, o in removed:
        i = find_record(s)
        if i is None:
            rejected.append((s, p, o, "remove"))
            continue
        matched = False
        kept = []
        for line in out_records[i]:
            prop = parse_prop(line)
            if prop and _line_matches_removal(prop[0], prop[1], prop[2], p, o):
                matched = True
                continue
            kept.append(line)
        out_records[i] = kept
        (applied if matched else rejected).append((s, p, o, "remove"))

    for s, p, o in added:
        i = find_record(s)
        if i is None:
            rejected.append((s, p, o, "add"))
            continue
        line = _property_lines_for_add(p, o)
        if line is None:
            rejected.append((s, p, o, "add"))
            continue
        out_records[i].append(line)
        applied.append((s, p, o, "add"))

    parts = []
    for record in out_records:
        parts.append("BEGIN:VCARD")
        parts.extend(record)
        parts.append("END:VCARD")
    return "\n".join(parts) + "\n", {"applied": applied, "rejected": rejected}
