"""Email (MIME) → quads converter.

Capability parity with the reference's EmailMessageConverter (SURVEY.md
§2.1): sender / to / cc / bcc agents, date sent, subject, In-Reply-To
threading, first text/plain body part; attachments skipped. Python stdlib
``email`` package; runs inside mapInPandas (sources/files.py).
"""

from __future__ import annotations

import email
import email.policy
import email.utils

from ..rdf import vocab
from ..rdf.model import XSD_DATETIME, XSD_STRING
from .common import doc_graph, mint, q


def _agent_quads(display: str, addr: str, g: str) -> tuple[str, list[tuple]]:
    addr = addr.strip().lower()
    agent = mint("agent", addr)
    mailto = f"mailto:{addr}"
    quads = [
        q(agent, vocab.RDF_TYPE, vocab.AGENT, g, otype="iri"),
        q(agent, vocab.EMAIL, mailto, g, otype="iri"),
        q(mailto, vocab.RDF_TYPE, vocab.EMAIL_ADDRESS, g, otype="iri"),
        q(mailto, vocab.NAME, addr, g),
    ]
    # drop display names that merely repeat the address (reference
    # EmailAddressNameConverter heuristic)
    if display and display.strip().lower() not in (addr, addr.split("@")[0]):
        quads.append(q(agent, vocab.NAME, display.strip(), g))
    return agent, quads


def eml_to_quads(content: bytes, path: str) -> list[tuple]:
    try:
        msg = email.message_from_bytes(content, policy=email.policy.default)
    except Exception:
        return []
    g = doc_graph(path)
    msg_id = (msg.get("Message-ID") or "").strip().strip("<>")
    m_iri = f"urn:message:{msg_id}" if msg_id else mint("message", path)
    quads = [q(m_iri, vocab.RDF_TYPE, vocab.EMAIL_MESSAGE, g, otype="iri")]

    subject = msg.get("Subject")
    if subject:
        quads.append(q(m_iri, vocab.HEADLINE, str(subject), g))
    date = msg.get("Date")
    if date:
        try:
            dt = email.utils.parsedate_to_datetime(date)
            quads.append(q(m_iri, vocab.DATE_SENT, dt.isoformat(), g, dtype=XSD_DATETIME))
        except (TypeError, ValueError):
            pass
    reply_to = (msg.get("In-Reply-To") or "").strip().strip("<>")
    if reply_to:
        quads.append(q(m_iri, vocab.IN_REPLY_TO, f"urn:message:{reply_to}", g, otype="iri"))

    for header, pred in (
        ("From", vocab.SENDER),
        ("To", vocab.RECIPIENT),
        ("Cc", vocab.CC_RECIPIENT),
        ("Bcc", vocab.BCC_RECIPIENT),
    ):
        values = msg.get_all(header) or []
        for display, addr in email.utils.getaddresses([str(v) for v in values]):
            if not addr or "@" not in addr:
                continue  # undisclosed-recipients etc.
            agent, aquads = _agent_quads(display, addr, g)
            quads.extend(aquads)
            quads.append(q(m_iri, pred, agent, g, otype="iri"))

    body = msg.get_body(preferencelist=("plain",))
    if body is not None:
        try:
            text = body.get_content().strip()
            if text:
                quads.append(q(m_iri, vocab.TEXT, text, g, dtype=XSD_STRING))
        except Exception:
            pass
    return quads
