"""Multi-class NB language identifier (operators/langid_nb.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from thymeflow_back_spark.operators.langid_nb import (
    LID_SCALE,
    langid_classify,
    langid_train,
)

B = 64
N = 3

DOCS = [
    (1, "aaa bbb aaa bbb aaa", "aa"),
    (2, "aaa aaa bbb aaa aaa", "aa"),
    (3, "zzz yyy zzz yyy zzz", "zz"),
    (4, "yyy zzz zzz yyy yyy", "zz"),
    (5, "mmm nnn mmm nnn mmm", "mm"),
]


def _model(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return df, *langid_train(df, "doc_id", "text", "lang", N, B)


def _bucket(gram: str) -> int:
    import hashlib

    return int(hashlib.md5(f"lid: {gram}".encode()).hexdigest()[:8], 16) % B


def test_weights_match_closed_form(spark):
    """Per-(class, bucket) weights, priors and unseen weights must equal
    the hand-computed multinomial NB values (add-one over B buckets,
    micro-nat quantization) recomputed in pure Python."""
    df, weights, classes = _model(spark)
    occ: list[tuple[str, int]] = []
    for _id, text, lang in DOCS:
        for i in range(len(text) - N + 1):
            occ.append((lang, _bucket(text[i : i + N])))
    tots = {}
    for lang, _b in occ:
        tots[lang] = tots.get(lang, 0) + 1
    got_w = {(r.lang, r.bucket): r.w_q for r in weights.collect()}
    assert got_w
    for (lang, b), w_q in got_w.items():
        c = sum(1 for l, bb in occ if l == lang and bb == b)
        assert c > 0  # only observed cells carry rows
        w = math.log(c + 1) - math.log(tots[lang] + B)
        assert w_q == round(w * LID_SCALE), (lang, b, c)
    got_c = {r.lang: r for r in classes.collect()}
    n_docs = {"aa": 2, "zz": 2, "mm": 1}
    for lang, r in got_c.items():
        assert r.n_docs == n_docs[lang]
        assert r.prior_q == round(math.log(n_docs[lang] + 1) * LID_SCALE)
        assert r.unseen_q == round(-math.log(tots[lang] + B) * LID_SCALE)
        assert r.occ_tot == tots[lang]


def test_classifier_recovers_training_languages(spark):
    df, weights, classes = _model(spark)
    out = {
        r.doc_id: r.pred_lang
        for r in langid_classify(df, "doc_id", "text", weights, classes, "lang", N, B).collect()
    }
    assert out == {1: "aa", 2: "aa", 3: "zz", 4: "zz", 5: "mm"}


def test_short_text_excluded_and_scores_exact(spark):
    """A document shorter than the n-gram size has no evidence and is
    excluded; every emitted score equals the exact integer dot product
    recomputed in Python."""
    df, weights, classes = _model(spark)
    new = spark.createDataFrame(
        [(10, "aaa bbb"), (11, "xy")], "doc_id long, text string"
    )
    rows = langid_classify(new, "doc_id", "text", weights, classes, "lang", N, B).collect()
    assert [r.doc_id for r in rows] == [10]
    # replay doc 10's argmax in Python
    w = {(r.lang, r.bucket): r.w_q for r in weights.collect()}
    cl = {r.lang: (r.prior_q, r.unseen_q) for r in classes.collect()}
    cnt: dict[int, int] = {}
    text = "aaa bbb"
    for i in range(len(text) - N + 1):
        b = _bucket(text[i : i + N])
        cnt[b] = cnt.get(b, 0) + 1
    best = min(
        (
            (
                -(
                    cl[lang][0]
                    + sum(c * w.get((lang, b), cl[lang][1]) for b, c in cnt.items())
                ),
                lang,
            )
            for lang in cl
        ),
    )
    assert (rows[0].pred_lang, rows[0].score_q) == (best[1], -best[0])


def test_partitioning_invariance(spark):
    rows = [
        (i, ("abc def ghi " if i % 2 else "uvw xyz rst ") * (2 + i % 4), "ab" if i % 2 else "uv")
        for i in range(40)
    ]
    outs = []
    for parts in (2, 13):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).repartition(parts)
        w, c = langid_train(df, "doc_id", "text", "lang", N, B)
        res = langid_classify(df, "doc_id", "text", w, c, "lang", N, B)
        outs.append(sorted((r.doc_id, r.pred_lang, r.score_q) for r in res.collect()))
    assert outs[0] == outs[1]
