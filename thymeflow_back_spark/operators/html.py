"""HTML main-content extraction: the front end of a web-corpus pipeline.

Every quality filter downstream (operators/text.py) assumes a clean text
column, but web corpora arrive as HTML where most of the byte volume is
chrome — navigation, sidebars, footers, banners. CCNet / RefinedWeb-style
pipelines therefore start with boilerplate removal. This module implements
the classic *link-density* block classifier (the core heuristic of
Kohlschuetter et al., "Boilerplate Detection using Shallow Text Features",
WSDM 2010): split the page into block-level elements, measure what
fraction of each block's visible text is anchor text, and keep the blocks
that are mostly prose. Navigation/footer blocks are link-dominated; main
content is not.

Distributed shape: parsing is a stdlib ``html.parser`` pass inside ONE
Arrow-batched ``mapInPandas`` scan — per-document state only, no shuffle
anywhere (the per-document aggregate is computed inside the same pass, so
``extract_main_content`` is a pure map over the corpus: the 100 TB plan is
scan -> project, the same shape as quality_filter). The float division for
``boilerplate_frac`` stays JVM-side (``F.round`` over the exact integer
char counts the parser emits) so the value matches the SQL oracles bit for
bit.

The reference has no HTML stage (its converters ingest MIME/vCard/iCal —
thymeflow/converter/*, SURVEY.md §2.1); this operator is part of the
beyond-reference training-data funnel, same tier as pii_scrub and
quality_filter.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import spread_small_input

# Elements that open a new text block. Anything else (inline tags: a, b,
# span, ...) flows into the enclosing block.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "nav", "aside", "footer", "header", "article",
        "section", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td",
        "pre", "blockquote", "ul", "ol", "table",
    }
)

# A block is content iff its anchor-text share is strictly below this.
MAX_LINK_DENSITY = 0.5

# Elements whose character data is never visible text.
_INVISIBLE = frozenset({"script", "style", "noscript", "template"})


def _id_type(df: DataFrame, id_col: str) -> str:
    """The id column's own DDL type: web-corpus doc ids are as often URL
    or hash STRINGS as integers, so the Arrow schema follows the input
    instead of hardcoding bigint."""
    return dict(df.dtypes)[id_col]


def _is_content(text_chars: int, link_chars: int, max_link_density: float) -> bool:
    return link_chars < max_link_density * text_chars


class _BlockParser(HTMLParser):
    """Linear block splitter: emits (tag, text, link_chars) per block.

    Text is whitespace-normalized (runs of whitespace -> one space, ends
    stripped); ``link_chars`` counts the normalized characters that sit
    inside <a> elements, summed per anchor so inter-anchor whitespace
    stays non-link.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str, int]] = []
        self._tag = ""
        self._parts: list[str] = []
        self._anchor_parts: list[str] | None = None
        self._link_chars = 0
        self._invisible = 0

    def _flush(self) -> None:
        if self._anchor_parts is not None:
            # an anchor spanning a block boundary (link cards wrap whole
            # blocks): settle its text into THIS block's link count and
            # restart the buffer for the next block — otherwise the chars
            # would leak into the following block's count
            self._link_chars += len(" ".join("".join(self._anchor_parts).split()))
            self._anchor_parts = []
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((self._tag, text, self._link_chars))
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _INVISIBLE:
            self._invisible += 1
        elif tag in BLOCK_TAGS:
            self._flush()
            self._tag = tag
        elif tag == "a":
            self._anchor_parts = []

    def handle_endtag(self, tag: str) -> None:
        if tag in _INVISIBLE:
            self._invisible = max(0, self._invisible - 1)
        elif tag in BLOCK_TAGS:
            self._flush()
            self._tag = ""
        elif tag == "a" and self._anchor_parts is not None:
            self._link_chars += len(" ".join("".join(self._anchor_parts).split()))
            self._anchor_parts = None

    def handle_data(self, data: str) -> None:
        if self._invisible:
            return  # script/style/noscript text is never visible
        self._parts.append(data)
        if self._anchor_parts is not None:
            self._anchor_parts.append(data)

    def parse(self, html: str) -> list[tuple[str, str, int]]:
        self.feed(html or "")
        self.close()
        self._flush()
        return self.blocks


def html_blocks(
    df: DataFrame,
    id_col: str,
    html_col: str,
    max_link_density: float = MAX_LINK_DENSITY,
) -> DataFrame:
    """Per-block decomposition: (id, block_idx, tag, text, text_chars,
    link_chars, is_content). One Arrow-batched scan, no shuffle."""
    import pandas as pd

    schema = (
        f"{id_col} {_id_type(df, id_col)}, block_idx int, tag string, text string, "
        "text_chars int, link_chars int, is_content boolean"
    )
    cols = [id_col, "block_idx", "tag", "text", "text_chars", "link_chars", "is_content"]

    def run(batches):
        for pdf in batches:
            rows = []
            for i, h in zip(pdf[id_col], pdf[html_col]):
                for idx, (tag, text, link) in enumerate(_BlockParser().parse(h)):
                    rows.append(
                        (i, idx, tag, text, len(text), link,
                         _is_content(len(text), link, max_link_density))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return spread_small_input(df.select(id_col, html_col)).mapInPandas(run, schema)


def extract_main_content(
    df: DataFrame,
    id_col: str,
    html_col: str,
    max_link_density: float = MAX_LINK_DENSITY,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Document-level extraction: (id, *carry, n_blocks, n_content_blocks,
    extracted_text, content_chars, boiler_chars, boilerplate_frac).

    ``extracted_text`` is the content blocks in page order joined by a
    newline; ``boilerplate_frac`` is boiler_chars / total visible chars
    (NULL for pages with no visible text). The per-document fold happens
    inside the SAME Arrow pass as the parse — the whole operator is one
    shuffle-free scan; only the final ratio is a JVM projection so the
    rounding discipline matches the SQL oracles.
    """
    import pandas as pd

    schema = (
        f"{id_col} {_id_type(df, id_col)}, "
        + "".join(f"{c} string, " for c in carry)
        + "n_blocks int, n_content_blocks int, extracted_text string, "
        "content_chars bigint, boiler_chars bigint"
    )
    cols = [id_col, *carry, "n_blocks", "n_content_blocks",
            "extracted_text", "content_chars", "boiler_chars"]

    def run(batches):
        for pdf in batches:
            rows = []
            for tup in zip(pdf[id_col], pdf[html_col], *[pdf[c] for c in carry]):
                i, h, extra = tup[0], tup[1], tup[2:]
                kept: list[str] = []
                content_chars = boiler_chars = n_blocks = 0
                for tag, text, link in _BlockParser().parse(h):
                    n_blocks += 1
                    if _is_content(len(text), link, max_link_density):
                        kept.append(text)
                        content_chars += len(text)
                    else:
                        boiler_chars += len(text)
                rows.append(
                    (i, *extra, n_blocks, len(kept), "\n".join(kept),
                     content_chars, boiler_chars)
                )
            yield pd.DataFrame(rows, columns=cols)

    out = spread_small_input(df.select(id_col, html_col, *carry)).mapInPandas(run, schema)
    total = F.col("content_chars") + F.col("boiler_chars")
    return out.withColumn(
        "boilerplate_frac",
        F.round(F.col("boiler_chars") / F.nullif(total, F.lit(0)), 9),
    )
