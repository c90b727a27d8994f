"""Query-to-text alignment: locate each query token's best match in a text.

Reference capability (thymeflow text/alignment/TextAlignment.scala, goldens
in AlignmentSpec.scala:36-52): given query tokens and a free-form text,
return for each query the matched substring and its [from, to] character
span (inclusive), e.g. align(["JOHN","SMITH"], "SMITH.JOHN") →
JOHN@[6,9], SMITH@[0,4].

Implementation: Smith-Waterman local alignment (match +2, mismatch/gap −1,
case-insensitive) of each query against the text; the reported span is the
text window of the best-scoring local alignment. Runs per row inside a UDF
(strings are person-name sized).
"""

from __future__ import annotations

from dataclasses import dataclass

MATCH, MISMATCH, GAP = 2, -1, -1


@dataclass(frozen=True)
class Aligned:
    query: str
    matched: str
    start: int  # inclusive
    end: int  # inclusive


def _smith_waterman(query: str, text: str) -> tuple[float, int, int]:
    """Best local alignment score and matched [start, end] span in text."""
    q, t = query.lower(), text.lower()
    nq, nt = len(q), len(t)
    best, best_i, best_j = 0.0, 0, 0
    prev = [0.0] * (nt + 1)
    # remember alignment start per cell to recover the span without traceback
    prev_start = list(range(nt + 1))
    for i in range(1, nq + 1):
        cur = [0.0] * (nt + 1)
        cur_start = [0] * (nt + 1)
        for j in range(1, nt + 1):
            diag = prev[j - 1] + (MATCH if q[i - 1] == t[j - 1] else MISMATCH)
            up = prev[j] + GAP
            left = cur[j - 1] + GAP
            score = max(0.0, diag, up, left)
            cur[j] = score
            if score == 0:
                cur_start[j] = j  # restart
            elif score == diag:
                cur_start[j] = prev_start[j - 1]
            elif score == left:
                cur_start[j] = cur_start[j - 1]
            else:
                cur_start[j] = prev_start[j]
            if score > best:
                best, best_i, best_j = score, cur_start[j], j
        prev, prev_start = cur, cur_start
    return best, best_i, best_j - 1


def align_queries(queries: list[str], text: str) -> list[Aligned]:
    """Align each query to its best local match in ``text``.

    Queries that score below half the perfect self-match are dropped
    (no plausible occurrence).
    """
    out: list[Aligned] = []
    for query in queries:
        if not query or not text:
            continue
        score, start, end = _smith_waterman(query, text)
        if score >= MATCH * len(query) / 2:
            out.append(Aligned(query=query, matched=text[start : end + 1], start=start, end=end))
    return out
