"""Unit tests for HTML main-content extraction (operators/html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thymeflow_back_spark.operators.html import (
    _BlockParser,
    extract_main_content,
    html_blocks,
)

PAGE = (
    "<html><body>"
    '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
    "<p>the quick brown fox jumps over the lazy dog</p>"
    "<p>pack my box with five dozen liquor jugs</p>"
    '<aside><a href="/r1">Related post 1</a></aside>'
    '<footer><a href="/tos">Terms of Service</a> '
    '<a href="/privacy">Privacy Policy</a> (c) 2024 site7.com</footer>'
    "</body></html>"
)


def test_parser_blocks_and_link_chars():
    blocks = _BlockParser().parse(PAGE)
    assert [t for t, _, _ in blocks] == ["nav", "p", "p", "aside", "footer"]
    nav_text, nav_link = blocks[0][1], blocks[0][2]
    assert nav_text == "Home About"
    assert nav_link == len("Home") + len("About")  # the separator space is non-link
    assert blocks[1] == ("p", "the quick brown fox jumps over the lazy dog", 0)
    aside_text, aside_link = blocks[3][1], blocks[3][2]
    assert aside_link == len(aside_text) == len("Related post 1")
    foot_text, foot_link = blocks[4][1], blocks[4][2]
    assert foot_text == "Terms of Service Privacy Policy (c) 2024 site7.com"
    assert foot_link == len("Terms of Service") + len("Privacy Policy")


def test_parser_normalizes_whitespace_and_entities():
    blocks = _BlockParser().parse("<p>  a\n\t b &amp; c  </p><div>\n  </div>")
    # whitespace-only blocks are dropped; entity decoded; runs collapsed
    assert blocks == [("p", "a b & c", 0)]


def test_parser_suppresses_invisible_elements():
    blocks = _BlockParser().parse(
        "<p>before<script>var x = 'no';</script> after</p>"
        "<style>p { color: red }</style><p>real</p>"
    )
    assert blocks == [("p", "before after", 0), ("p", "real", 0)]


def test_parser_untagged_prefix_text_is_its_own_block():
    blocks = _BlockParser().parse("stray lead-in<p>real para</p>")
    assert blocks == [("", "stray lead-in", 0), ("p", "real para", 0)]


def test_html_blocks_dataframe(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id bigint, html string")
    rows = html_blocks(df, "doc_id", "html").orderBy("block_idx").collect()
    assert [r["is_content"] for r in rows] == [False, True, True, False, False]
    assert rows[1]["text_chars"] == len(rows[1]["text"])


def test_extract_main_content_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, PAGE, "en"), (2, "<p></p>", "de")], "doc_id bigint, html string, lang string"
    )
    out = {
        r["doc_id"]: r
        for r in extract_main_content(df, "doc_id", "html", carry=("lang",)).collect()
    }
    r1 = out[1]
    assert r1["n_blocks"] == 5 and r1["n_content_blocks"] == 2
    assert r1["extracted_text"] == (
        "the quick brown fox jumps over the lazy dog\n"
        "pack my box with five dozen liquor jugs"
    )
    assert r1["lang"] == "en"
    total = r1["content_chars"] + r1["boiler_chars"]
    assert r1["boilerplate_frac"] == round(r1["boiler_chars"] / total, 9)
    # a page with no visible text: zero blocks, NULL frac (no 0/0)
    r2 = out[2]
    assert r2["n_blocks"] == 0 and r2["extracted_text"] == ""
    assert r2["boilerplate_frac"] is None


def test_link_density_threshold_boundary(spark):
    # exactly half anchor text -> boilerplate (strict <); just under -> content
    half = '<p><a href="/x">aaaa</a> bbb</p>'  # 4 link / 8 total
    under = '<p><a href="/x">aaa</a> bbbb</p>'  # 3 link / 8 total
    df = spark.createDataFrame(
        [(1, half), (2, under)], "doc_id bigint, html string"
    )
    rows = {r["doc_id"]: r for r in html_blocks(df, "doc_id", "html").collect()}
    assert rows[1]["is_content"] is False
    assert rows[2]["is_content"] is True


def test_parser_properties_on_generated_pages():
    """Hypothesis sweep: arbitrary nesting of block/inline/invisible tags
    with arbitrary text never crashes the parser, and two invariants hold —
    every block's link_chars <= text_chars, and visible non-whitespace
    characters are conserved (sum over blocks == sum over visible text
    nodes after whitespace collapse)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FF),
        min_size=0, max_size=12,
    )

    def node(children):
        return st.one_of(
            words.map(lambda w: ("text", w)),
            st.tuples(
                st.sampled_from(["p", "div", "nav", "li", "h1"]),
                st.lists(children, max_size=4),
            ).map(lambda t: ("block", *t)),
            st.lists(children, max_size=3).map(lambda c: ("a", c)),
            words.map(lambda w: ("script", w)),
        )

    trees = st.lists(st.recursive(words.map(lambda w: ("text", w)), node, max_leaves=20), max_size=6)

    def render(nodes):
        out = []
        for n in nodes:
            if n[0] == "text":
                from html import escape

                out.append(escape(n[1]))
            elif n[0] == "block":
                out.append(f"<{n[1]}>" + render(n[2]) + f"</{n[1]}>")
            elif n[0] == "a":
                out.append('<a href="/x">' + render(n[1]) + "</a>")
            else:
                out.append("<script>" + n[1].replace("<", " ") + "</script>")
        return "".join(out)

    def visible_chars(nodes, in_script=False):
        total = 0
        for n in nodes:
            if n[0] == "text":
                total += len("".join(n[1].split()))
            elif n[0] == "block":
                total += visible_chars(n[2])
            elif n[0] == "a":
                total += visible_chars(n[1])
        return total

    @settings(max_examples=200, deadline=None)
    @given(tree=trees)
    def prop(tree):
        blocks = _BlockParser().parse(render(tree))
        for _, text, link in blocks:
            assert 0 <= link <= len(text)
            assert text == " ".join(text.split())  # normalized
        got = sum(len("".join(t.split())) for _, t, _ in blocks)
        assert got == visible_chars(tree)

    prop()


def test_funnel_matches_quality_gate_on_recovered_text(spark, sf_dir):
    # extraction recovers exactly the original tokens, so the funnel's keep
    # decision per document equals the plain quality gate's on `text`
    from thymeflow_back_spark.operators.text import quality_filter
    from thymeflow_back_spark.queries.webcorpus import with_synth_html
    from thymeflow_back_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    pages = with_synth_html(docs)
    ex = extract_main_content(pages, "doc_id", "html").withColumn(
        "flat_text", F.translate("extracted_text", "\n", " ")
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in quality_filter(ex, "doc_id", "flat_text").collect()
    }
    want = {
        r["doc_id"]: r["keep"] for r in quality_filter(docs, "doc_id", "text").collect()
    }
    assert got == want


def test_anchor_spanning_block_boundary():
    # a link card: the whole block sits inside one anchor — its text is
    # fully link text, and nothing leaks into the following block
    blocks = _BlockParser().parse('<a href="/x"><p>card title</p></a><p>body</p>')
    assert blocks == [("p", "card title", len("card title")), ("p", "body", 0)]


def test_string_doc_ids(spark):
    """Web-corpus ids are often URL/hash strings: the Arrow schema must
    follow the input id type instead of hardcoding bigint."""
    df = spark.createDataFrame(
        [("https://ex.com/a", PAGE)], "doc_id string, html string"
    )
    blocks = html_blocks(df, "doc_id", "html")
    assert dict(blocks.dtypes)["doc_id"] == "string"
    rows = blocks.collect()
    assert {r["doc_id"] for r in rows} == {"https://ex.com/a"}
    out = extract_main_content(df, "doc_id", "html").collect()
    assert out[0]["doc_id"] == "https://ex.com/a" and out[0]["n_content_blocks"] == 2


def test_synth_html_escapes_markup_unsafe_text(spark):
    """with_synth_html must HTML-escape tokens so '&'/'<'/'>' in document
    text round-trip through the parser unchanged (convert_charrefs)."""
    from thymeflow_back_spark.queries.webcorpus import with_synth_html

    text = "a&b <tag> x>y plain"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    page = with_synth_html(df).select("html").collect()[0]["html"]
    assert "a&amp;b" in page and "&lt;tag&gt;" in page
    out = extract_main_content(with_synth_html(df), "doc_id", "html").collect()[0]
    assert out["extracted_text"] == text
    assert out["content_chars"] == len(text)
