"""Exact substring dedup (operators/substring.py) vs a brute-force replica.

The brute force recomputes windows, flagged positions, islands, canonical
occurrences, and token removal in plain Python over the same corpus, so
any drift in the distributed formulation (window hashing, island merge
boundaries, canonical tie-breaks) fails loudly.
"""

from __future__ import annotations

from thymeflow_back_spark.operators.substring import (
    duplicated_spans,
    scrub_duplicated_spans,
)

W = 3

DOCS = [
    # d1/d2 share the 6-token run "a b c d e f" (=> islands via abutting
    # 3-token windows); d2 additionally repeats "x y z" within itself;
    # d3 is unique; d4 is shorter than one window; d5 shares only the
    # trailing window of d1's span.
    (1, "a b c d e f q r s"),
    (2, "p p2 a b c d e f x y z h x y z"),
    (3, "unique tokens only here nothing shared"),
    (4, "tiny doc"),
    (5, "m n d e f o"),
]


def brute_windows():
    wins = []  # (doc, pos, text)
    for doc, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        for i in range(max(len(toks) - W + 1, 0)):
            wins.append((doc, i, " ".join(toks[i : i + W])))
    return wins


def brute_spans():
    wins = brute_windows()
    counts: dict[str, int] = {}
    for _, _, w in wins:
        counts[w] = counts.get(w, 0) + 1
    flagged: dict[int, list[int]] = {}
    for doc, pos, w in wins:
        if counts[w] >= 2:
            flagged.setdefault(doc, []).append(pos)
    spans = []
    for doc, positions in flagged.items():
        positions.sort()
        start = prev = positions[0]
        for p in positions[1:]:
            if p > prev + W:
                spans.append((doc, start, prev + W, prev + W - start))
                start = p
            prev = p
        spans.append((doc, start, prev + W, prev + W - start))
    return sorted(spans)


def brute_scrub():
    wins = brute_windows()
    occs: dict[str, list[tuple[int, int]]] = {}
    for doc, pos, w in wins:
        occs.setdefault(w, []).append((doc, pos))
    covered: dict[int, set[int]] = {}
    for w, positions in occs.items():
        if len(positions) < 2:
            continue
        canonical = min(positions)
        for doc, pos in positions:
            if (doc, pos) != canonical:
                covered.setdefault(doc, set()).update(range(pos, pos + W))
    out = []
    for doc, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue  # operator contract: rows only for docs with >= 1 token
        cut = covered.get(doc, set())
        kept = [t for i, t in enumerate(toks) if i not in cut]
        out.append((doc, " ".join(kept), len(toks), len(toks) - len(kept)))
    return sorted(out)


def test_duplicated_spans_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, "doc_id", "text", W).collect()
    )
    assert got == brute_spans()
    # sanity on the fixture itself: d1+d2 each cover the shared 6-token
    # run as ONE island; d2's intra-doc "x y z" repeat is flagged too
    docs_with_spans = {d for d, *_ in got}
    assert {1, 2, 5} <= docs_with_spans
    assert 3 not in docs_with_spans and 4 not in docs_with_spans


def test_scrub_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = sorted(
        (r.doc_id, r.clean_text, r.n_tokens, r.n_removed)
        for r in scrub_duplicated_spans(df, "doc_id", "text", W).collect()
    )
    assert got == brute_scrub()
    by_doc = {d: (t, n, r) for d, t, n, r in got}
    # keep-first: doc 1 (smallest id) keeps the shared run verbatim
    assert by_doc[1] == ("a b c d e f q r s", 9, 0)
    # doc 2 loses the shared run AND its second intra-doc "x y z"
    assert by_doc[2][2] > 0 and "a b c" not in by_doc[2][0]
    # untouched docs survive verbatim
    assert by_doc[3][2] == 0 and by_doc[4] == ("tiny doc", 2, 0)


def test_scrub_idempotent_on_clean_corpus(spark):
    clean = [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d") for i in range(6)]
    df = spark.createDataFrame(clean, "doc_id int, text string")
    rows = scrub_duplicated_spans(df, "doc_id", "text", W).collect()
    assert all(r.n_removed == 0 for r in rows)
    assert {r.clean_text for r in rows} == {t for _, t in clean}


def test_substring_ops_match_brute_force_random_corpora(spark):
    """Randomized sweep: small token alphabet + short docs force heavy
    window collisions, shared runs that abut island boundaries, and
    intra-document repeats — the regimes where off-by-one in the island
    merge or canonical tie-break would show. Deterministic seeds."""
    import random

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        docs = [
            (i, " ".join(rng.choice("abcdef") for _ in range(rng.randint(0, 14))))
            for i in range(12)
        ]
        global DOCS
        saved = DOCS
        try:
            DOCS = docs
            df = spark.createDataFrame(docs, "doc_id int, text string")
            got_spans = sorted(
                (r.doc_id, r.span_start, r.span_end, r.span_tokens)
                for r in duplicated_spans(df, "doc_id", "text", W).collect()
            )
            assert got_spans == brute_spans(), f"spans diverge at seed {seed}"
            got_scrub = sorted(
                (r.doc_id, r.clean_text, r.n_tokens, r.n_removed)
                for r in scrub_duplicated_spans(df, "doc_id", "text", W).collect()
            )
            assert got_scrub == brute_scrub(), f"scrub diverges at seed {seed}"
        finally:
            DOCS = saved
