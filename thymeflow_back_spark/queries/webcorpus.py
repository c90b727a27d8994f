"""Web-corpus front-end queries: HTML main-content extraction + the
composed extraction->quality funnel.

The documents table carries clean text, so (as with q_url_canonical's
synthetic URLs) each test page is SYNTHESIZED deterministically from
md5(doc_id) bytes around the document's real text: the text becomes the
<p> paragraphs (40-word chunks, the q_doc_chunks idiom), and the chrome —
a nav bar with 2-5 links, a related-posts sidebar with 1-3 links, a
two-link footer — is template boilerplate whose visible-text size is a
pure formula of the digest bytes. The Spark side renders the page with
JVM string expressions and runs the REAL parser (operators/html.py, one
Arrow-batched scan); the DuckDB oracle never parses HTML at all — it
derives the expected output straight from the generation formula. Ground
truth, not a second parser implementation.

Every boilerplate template is link-dominated by construction (anchor text
>= half the visible text), and paragraphs contain no links, so the
link-density classifier's decision is exact on this family — which is
what makes the ground-truth oracle sound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .catalog import query

HTML_PARA_WORDS = 40
NAV_LABELS = ("Home", "About", "Contact", "Blog", "Shop", "Careers")
FOOTER_TEXT_PREFIX = "Terms of Service Privacy Policy (c) 2024 site"

# DuckDB byte i (0-indexed) of md5 hex digest column h
_MD5B = "('0x' || substr(h, {o}, 2))::BIGINT"

_SQL_DIMS = f"""
    b AS (
      SELECT doc_id, lang, text, md5('html:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    v AS (
      SELECT doc_id, lang, text,
             {_MD5B.format(o=1)} AS b0, {_MD5B.format(o=3)} AS b1,
             {_MD5B.format(o=5)} AS b2
      FROM b
    ),
    t AS (
      SELECT doc_id, lang, b0, b1, b2,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM v
    ),
    dims AS (
      SELECT doc_id, lang, toks,
             greatest(CAST(ceil(len(toks) / {HTML_PARA_WORDS}.0) AS INTEGER), 1) AS nch,
             CAST(b0 % 4 + 2 AS INTEGER) AS nnav,
             CAST(b1 % 3 + 1 AS INTEGER) AS nrel,
             b2 % 40 AS siteno
      FROM t
    ),
    x AS (
      SELECT doc_id, lang, nch,
             array_to_string(list_transform(generate_series(0, nch - 1),
               i -> array_to_string(
                 toks[i * {HTML_PARA_WORDS} + 1 : i * {HTML_PARA_WORDS} + {HTML_PARA_WORDS}],
                 ' ')), chr(10)) AS extracted_text,
             CAST(
               len(array_to_string(
                 list_slice({list(NAV_LABELS)!r}, 1, nnav), ' '))
               + len(array_to_string(list_transform(generate_series(1, nrel),
                   j -> 'Related post ' || CAST(j AS VARCHAR)), ' '))
               + len('{FOOTER_TEXT_PREFIX}' || CAST(siteno AS VARCHAR) || '.com')
             AS BIGINT) AS boiler_chars
      FROM dims
    ),
    pages AS (
      SELECT doc_id, lang, nch, extracted_text, boiler_chars,
             CAST(len(extracted_text) - (nch - 1) AS BIGINT) AS content_chars
      FROM x
    )
"""


def _b(m: Column, i: int) -> Column:
    """Byte i of an md5 hex digest column, as bigint."""
    return F.conv(F.substring(m, 2 * i + 1, 2), 16, 10).cast("bigint")


def _html_esc(t: Column) -> Column:
    """Minimal HTML escaping (& first, then < and >): the parser runs with
    convert_charrefs=True, so escaped text parses back to the ORIGINAL
    characters — the render is markup-safe for any token content while the
    oracle keeps deriving truth from the raw text, char counts unchanged."""
    t = F.replace(t, F.lit("&"), F.lit("&amp;"))
    t = F.replace(t, F.lit("<"), F.lit("&lt;"))
    return F.replace(t, F.lit(">"), F.lit("&gt;"))


def with_synth_html(docs: DataFrame, out_col: str = "html") -> DataFrame:
    """Render each document as a deterministic HTML page (see module doc).

    Precondition (oracle parity, not parser correctness): every document's
    text must contain at least one non-space character — an all-empty text
    renders an empty <p> the parser (correctly) drops, while the formula
    oracle counts nch+3 blocks. The test tables satisfy this (same class
    of data assumption as the '·' delimiter note in the BPE oracle).
    Markup-unsafe characters are fine: tokens are HTML-escaped below and
    unescape back to the original on parse."""
    m = F.md5(F.concat(F.lit("html:"), F.col("doc_id").cast("string")))
    toks = F.transform(
        F.filter(F.split(F.col("text"), " "), lambda t: t != ""), _html_esc
    )
    nch = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(HTML_PARA_WORDS))).cast("int"), F.lit(1)
    )
    nnav = (_b(m, 0) % 4 + 2).cast("int")
    nrel = (_b(m, 1) % 3 + 1).cast("int")
    siteno = (_b(m, 2) % 40).cast("string")
    labels = F.array(*[F.lit(x) for x in NAV_LABELS])

    def anchor(txt: Column, href: str) -> Column:
        return F.concat(F.lit(f'<a href="{href}">'), txt, F.lit("</a>"))

    nav = F.concat(
        F.lit("<nav>"),
        F.array_join(
            F.transform(F.slice(labels, 1, nnav), lambda x: anchor(x, "/nav")), " "
        ),
        F.lit("</nav>"),
    )
    paras = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nch - 1),
            lambda i: F.concat(
                F.lit("<p>"),
                F.array_join(
                    F.slice(toks, i * HTML_PARA_WORDS + 1, HTML_PARA_WORDS), " "
                ),
                F.lit("</p>"),
            ),
        ),
        "",
    )
    aside = F.concat(
        F.lit("<aside>"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), nrel),
                lambda j: anchor(
                    F.concat(F.lit("Related post "), j.cast("string")), "/rel"
                ),
            ),
            " ",
        ),
        F.lit("</aside>"),
    )
    footer = F.concat(
        F.lit(
            '<footer><a href="/tos">Terms of Service</a> '
            '<a href="/privacy">Privacy Policy</a> (c) 2024 site'
        ),
        siteno,
        F.lit(".com</footer>"),
    )
    page = F.concat(
        F.lit("<html><body>"), nav, paras, aside, footer, F.lit("</body></html>")
    )
    return docs.withColumn(out_col, page)


@query(
    "q_html_extract",
    bench=True,  # the one Arrow mapInPandas family in the headline set
    oracle=f"""
    WITH {_SQL_DIMS}
    SELECT doc_id,
           CAST(nch + 3 AS INTEGER) AS n_blocks,
           nch AS n_content_blocks,
           content_chars, boiler_chars, extracted_text,
           round(boiler_chars / (boiler_chars + content_chars), 9) AS boilerplate_frac
    FROM pages ORDER BY doc_id
    """,
    doc="HTML main-content extraction (operators/html.py): link-density "
    "block classification (Kohlschuetter et al., WSDM 2010) over pages "
    "synthesized from md5(doc_id) around the real document text — nav/"
    "sidebar/footer chrome is link-dominated, paragraphs link-free, so "
    "the classifier's decisions are exact and the oracle derives the "
    "expected extraction straight from the generation formula (the "
    "q_url_canonical ground-truth pattern). One Arrow-batched scan, no "
    "shuffle; the full extracted text is value-checked.",
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html import extract_main_content

    pages = with_synth_html(load(spark, sf_dir, "documents"))
    return extract_main_content(pages, "doc_id", "html").select(
        "doc_id", "n_blocks", "n_content_blocks", "content_chars",
        "boiler_chars", "extracted_text", "boilerplate_frac",
    ).orderBy("doc_id")


@query(
    "q_html_quality_funnel",
    oracle=f"""
    WITH {_SQL_DIMS},
    flat AS (
      -- the paragraph chunks partition the token list, so the newline-
      -- flattened extracted text is exactly the tokens joined by ' '
      SELECT doc_id, lang, boiler_chars, content_chars,
             replace(extracted_text, chr(10), ' ') AS flat_text
      FROM pages
    ),
    ft AS (
      SELECT doc_id, lang, boiler_chars, content_chars,
             list_filter(string_split(flat_text, ' '), x -> x <> '') AS toks
      FROM flat
    ),
    m AS (
      SELECT doc_id, lang, boiler_chars, content_chars,
             len(toks) AS n_words,
             COALESCE(list_max(list_transform(toks, t -> length(t))), 0) AS max_word_len,
             CASE WHEN len(toks) <= 5000 THEN
               list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) / NULLIF(len(toks), 0)
             END AS rep_ratio,
             len(list_filter(toks, t -> list_contains(
               ['a','an','and','in','is','of','the','to'], t))) / NULLIF(len(toks), 0) AS stopword_ratio,
             len(list_distinct(toks)) / NULLIF(len(toks), 0) AS unique_ratio
      FROM ft
    ),
    gated AS (
      SELECT lang, boiler_chars, content_chars,
        (CASE WHEN n_words < 5 THEN 'too_few_words'
              WHEN n_words > 5000 THEN 'too_many_words'
              WHEN max_word_len > 20 THEN 'word_too_long'
              WHEN rep_ratio > 0.25 THEN 'too_repetitive'
              WHEN stopword_ratio < 0.01 THEN 'low_stopword'
              WHEN unique_ratio < 0.3 THEN 'low_diversity'
         END) IS NULL AS keep
      FROM m
    )
    SELECT lang, keep, COUNT(*) AS n_docs,
           CAST(SUM(content_chars) AS BIGINT) AS total_content_chars,
           round(SUM(boiler_chars) / SUM(boiler_chars + content_chars), 9) AS boiler_frac
    FROM gated GROUP BY lang, keep ORDER BY lang, keep
    """,
    doc="Composed web-corpus funnel: synthesized pages -> HTML main-content "
    "extraction -> C4/Gopher quality gate over the whitespace-flattened "
    "extracted text -> per-(lang, keep) keep-rate profile. The group "
    "boilerplate share is computed from exact integer char sums (one "
    "rounded division per group — aggregation-order-free), and the whole "
    "Spark plan is scan -> Arrow parse -> projection -> one aggregate "
    "exchange.",
)
def q_html_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.html import extract_main_content
    from ..operators.text import quality_filter

    pages = with_synth_html(load(spark, sf_dir, "documents"))
    ex = extract_main_content(pages, "doc_id", "html", carry=("lang",))
    # flatten the paragraph separators so the gate sees the page's words,
    # not newline-glued token pairs
    ex = ex.withColumn("flat_text", F.translate("extracted_text", "\n", " "))
    gated = quality_filter(
        ex, "doc_id", "flat_text", carry=("lang", "boiler_chars", "content_chars")
    )
    total = F.col("boiler_chars") + F.col("content_chars")
    return (
        gated.select("lang", "keep", "boiler_chars", "content_chars", total.alias("total"))
        .groupBy("lang", "keep")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("content_chars").alias("total_content_chars"),
            F.round(F.sum("boiler_chars") / F.sum("total"), 9).alias("boiler_frac"),
        )
        .orderBy("lang", "keep")
    )
