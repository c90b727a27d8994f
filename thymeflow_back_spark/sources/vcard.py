"""vCard → quads converter.

Capability parity with the reference's VCardConverter (SURVEY.md §2.1):
FN/N/NICKNAME, BDAY (with the year-1970 "no year" convention mapped to an
xsd:gMonthDay literal), ADR → PostalAddress node, EMAIL → mailto IRI, TEL →
tel: IRI (normalized), ORG, URL. Tolerant hand parser (RFC 6350 subset) —
no external vcard library in the runtime.
"""

from __future__ import annotations

import re

from ..rdf import vocab
from ..rdf.model import XSD_STRING
from .common import doc_graph, mint, parse_prop, q, unfold_lines

XSD_GMONTHDAY = "http://www.w3.org/2001/XMLSchema#gMonthDay"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"


def _tel_uri(value: str) -> str:
    cleaned = re.sub(r"[\s\-().]", "", value)
    return f"tel:{cleaned}"


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
                (vocab.FAMILY_NAME, vocab.GIVEN_NAME, vocab.ADDITIONAL_NAME)
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
        for _, v in by_name.get("TEL", []):
            tel = _tel_uri(v)
            quads.append(q(card, vocab.TELEPHONE, tel, g, otype="iri"))
            quads.append(q(tel, vocab.RDF_TYPE, vocab.PHONE_NUMBER, g, otype="iri"))
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
                (parts[3], vocab.ADDRESS_LOCALITY),
                (parts[4], vocab.ADDRESS_REGION),
                (parts[5], vocab.POSTAL_CODE),
                (parts[6], vocab.ADDRESS_COUNTRY),
            ):
                if val.strip():
                    quads.append(q(addr, pred, val.strip(), g))
    return quads
