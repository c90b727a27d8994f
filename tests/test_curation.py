"""Unit tests for the round-6 curation operators: keep-best dedup collapse,
cross-table LSH decontamination, and DSIR importance resampling."""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from thymeflow_back_spark.operators import dedup as D
from thymeflow_back_spark.operators.dsir import (
    LOGW_SCALE,
    dsir_logratio_weights,
    dsir_resample,
    dsir_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")


def test_keep_best_prefers_quality_then_smallest_id(spark):
    # docs 1/2/3 are near-identical (one cluster); 2 is longest; 10 is a singleton
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, 10),
        (2, base + " iota", 99),
        (3, base, 10),
        (10, "completely different words nothing shared here at all", 7),
    ]
    out = D.dedup_keep_best(_docs(spark, rows), "doc_id", "text", "n_chars").collect()
    by_canon = {r["canonical_id"]: r for r in out}
    assert set(by_canon) == {1, 10}
    winner = by_canon[1]
    assert winner["doc_id"] == 2  # highest n_chars wins, not smallest id
    assert winner["cluster_size"] == 3
    assert winner["n_chars"] == 99
    assert by_canon[10]["doc_id"] == 10 and by_canon[10]["cluster_size"] == 1


def test_keep_best_tie_breaks_to_smallest_id(spark):
    base = "one two three four five six seven eight"
    rows = [(5, base, 42), (7, base, 42)]
    out = D.dedup_keep_best(_docs(spark, rows), "doc_id", "text", "n_chars").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 5


def test_cross_contamination_lsh_matches_direct_jaccard(spark):
    # recall contract: every cross-pair the plain blocked join finds at the
    # threshold must also be found via band collisions (and values match)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    got = {
        (r["train_id"], r["bench_id"]): (r["n_common"], round(r["jaccard"], 9))
        for r in D.cross_contamination_lsh(
            train, bench, "doc_id", "text", 3, 0.5
        ).collect()
    }
    pairs = D.jaccard_near_dups(docs, "doc_id", "text", 3, 0.5).collect()
    want = {}
    for r in pairs:
        for t, b in ((r["a_id"], r["b_id"]), (r["b_id"], r["a_id"])):
            if t % 7 != 0 and b % 7 == 0:
                want[(t, b)] = (r["n_common"], round(r["jaccard"], 9))
    assert got == want and len(want) > 0


def test_keep_best_keeps_fractional_quality_exact(spark):
    # ADVICE r6: a bigint cast truncated fractional quality, electing the
    # wrong survivor (0.9 vs 0.2 both truncate to 0). Native-type ranking
    # must elect the 0.9 copy and report the unmodified score.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, base, 0.2), (2, base + " iota", 0.9), (3, base, 0.1)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, q double")
    out = D.dedup_keep_best(df, "doc_id", "text", "q").collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 2 and out[0]["q"] == 0.9


def _logratio_expected(rows, n_buckets):
    """Brute-force replica of dsir_logratio_weights in plain Python."""

    def bucket(a, b):
        h = hashlib.md5(f"dsir: {a} {b}".encode()).hexdigest()[:8]
        return int(h, 16) % n_buckets

    occ = []  # (doc_id, bucket, is_target)
    for doc_id, text, lang in rows:
        toks = [t for t in text.split(" ") if t]
        for i in range(len(toks) - 1):
            occ.append((doc_id, bucket(toks[i], toks[i + 1]), lang == "en"))
    r_cnt = Counter(b for _, b, _ in occ)
    t_cnt = Counter(b for _, b, t in occ if t)
    r_tot, t_tot = sum(r_cnt.values()), sum(t_cnt.values())
    lr_q = {
        b: int(
            Decimal(
                (
                    math.log(t_cnt.get(b, 0) + 1)
                    - math.log(r_cnt[b] + 1)
                    + math.log(r_tot + n_buckets)
                    - math.log(t_tot + n_buckets)
                )
                * LOGW_SCALE
            ).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        for b in r_cnt
    }
    want = {}
    for doc_id in {d for d, _, _ in occ}:
        terms = [lr_q[b] for d, b, _ in occ if d == doc_id]
        want[doc_id] = (len(terms), sum(terms))
    return want


def test_dsir_logratio_matches_bruteforce(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the mat and the cat ran", "en"),
        (3, "the cat sat on the mat", "raw"),
        (4, "zzq qxv vnm mlp plk lkj", "raw"),
        (5, "only", "raw"),  # no bigrams -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logw_q"], r["logw"])
        for r in dsir_logratio_weights(
            df, "doc_id", "text", F.col("lang") == "en", n_buckets=64
        ).collect()
    }
    want = _logratio_expected(rows, 64)
    assert set(got) == set(want) == {1, 2, 3, 4}
    for doc_id, (n_bg, logw_q) in want.items():
        assert got[doc_id] == (n_bg, logw_q, logw_q / LOGW_SCALE)
    # the paper's estimator must rank target-like docs above disjoint ones
    assert got[1][2] > got[4][2]


def test_dsir_weights_favor_target_like_documents(spark):
    # target = lang 'en'; an English-bigram doc must outweigh a disjoint one
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the mat", "en"),
        (3, "the cat sat on the mat", "raw"),  # same bigrams, not target
        (4, "zzq qxv vnm mlp plk lkj", "raw"),  # bigrams never in target
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    w = {
        r["doc_id"]: r
        for r in dsir_weights(
            df, "doc_id", "text", F.col("lang") == "en", n_buckets=256
        ).collect()
    }
    assert set(w) == {1, 2, 3, 4}
    # docs 1-3 share buckets: target mass counts only en occurrences
    assert w[3]["weight"] == w[1]["weight"]  # same bigrams -> same masses
    assert w[4]["t_mass"] == 0  # disjoint bigrams, no target hits (unless
    # a 256-bucket collision; the chosen strings don't collide)
    assert w[1]["weight"] > w[4]["weight"]


def test_dsir_excludes_sub_bigram_docs_and_is_deterministic(spark):
    rows = [
        (1, "only", "en"),  # 1 token -> no bigrams -> excluded
        (2, "two tokens here", "en"),
        (3, "two tokens here", "raw"),
        (4, "more filler words arrive", "raw"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    sel1 = dsir_resample(df, "doc_id", "text", F.col("lang") == "en", n=2)
    sel2 = dsir_resample(df, "doc_id", "text", F.col("lang") == "en", n=2)
    ids1 = sorted(r["doc_id"] for r in sel1.collect())
    ids2 = sorted(r["doc_id"] for r in sel2.collect())
    assert ids1 == ids2 and len(ids1) == 2 and 1 not in ids1


def test_contaminated_spans_cross_corpus(spark):
    """Train spans matching eval windows: exact matches flagged (including
    the snippet's source document), non-matching text untouched, spans
    merged maximally."""
    from thymeflow_back_spark.operators.substring import contaminated_spans

    w = 3
    base = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    train = spark.createDataFrame(
        [
            (1, base),                          # source: full overlap with eval slice
            (2, "x0 x1 t2 t3 t4 t5 x2 x3"),     # carries tokens 2..5 of eval
            (3, "a b c d e f g h"),             # clean
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "t2 t3 t4 t5 t6")], "doc_id long, text string"
    )
    out = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in contaminated_spans(train, eval_df, "doc_id", "text", w).collect()
    )
    # doc 1: eval windows cover tokens 2..6 -> one span [2, 7)
    # doc 2: windows 't2 t3 t4'/'t3 t4 t5' match -> span [2, 6)
    assert out == [(1, 2, 7, 5), (2, 2, 6, 4)]
    # empty eval set: nothing flagged
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert contaminated_spans(train, empty, "doc_id", "text", w).count() == 0


def test_backoff_lm_levels_and_alpha_penalty(spark):
    """Stupid backoff must hit the right level per position and apply the
    quantized alpha penalty exactly; hand-checked on a tiny corpus."""
    import math

    from thymeflow_back_spark.operators.backoff_lm import (
        LM_SCALE,
        LNQ_ALPHA,
        backoff_lm_scores,
    )

    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (5, "b c x")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (10, "a b c"),    # trigram 'a b c' seen twice -> tri level
            (11, "d b c"),    # 'd b c' unseen, 'b c' seen -> bi level
            (12, "zz qq d"),  # nothing seen -> uni floor (d in vocab)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in backoff_lm_scores(train, score, "doc_id", "text").collect()}

    def lnq(x):
        return round(math.log(x) * LM_SCALE)

    # doc 10: c('a b c')=2, ctx c('a b')=2 -> lnq2 - lnq2 = 0
    assert (out[10].n_tri, out[10].n_bi, out[10].n_uni) == (1, 0, 0)
    assert out[10].score_q == lnq(2) - lnq(2) == 0
    # doc 11: backoff to 'b c' (count 3), c('b')=3
    assert (out[11].n_tri, out[11].n_bi, out[11].n_uni) == (0, 1, 0)
    assert out[11].score_q == LNQ_ALPHA + lnq(3) - lnq(3)
    # doc 12: full floor; w3='d' has count 1, N = 11 train tokens
    assert (out[12].n_tri, out[12].n_bi, out[12].n_uni) == (0, 0, 1)
    assert out[12].score_q == 2 * LNQ_ALPHA + lnq(1 + 1) - lnq(11 + 1)
    # a doc with < 3 tokens is excluded
    short = spark.createDataFrame([(20, "a b")], "doc_id long, text string")
    assert backoff_lm_scores(train, short, "doc_id", "text").count() == 0


def test_luhn_validator_and_detection(spark):
    from pyspark.sql import functions as F

    from thymeflow_back_spark.operators.text import (
        cc_detect,
        luhn_check_digit,
        luhn_valid,
    )

    df = spark.createDataFrame(
        [
            ("4111111111111111", True),   # classic valid test PAN
            ("4111111111111112", False),  # corrupted check digit
            ("79927398713", True),        # the canonical Luhn example
            ("1234567890123456", False),
            # totality outside cc_detect's regex guard (round-10 advice
            # fix): empty / non-digit inputs are FALSE, never NULL
            ("", False),
            ("4111-1111-1111-1111", False),
            ("abc", False),
        ],
        "s string, expect boolean",
    )
    rows = df.select("s", "expect", luhn_valid(F.col("s")).alias("got")).collect()
    assert all(r.got == r.expect for r in rows), rows
    # check-digit synthesis makes any base valid
    synth = spark.createDataFrame(
        [(f"4{i:014d}",) for i in range(7)], "b string"
    ).select(
        F.concat(F.col("b"), luhn_check_digit(F.col("b")).cast("string")).alias("cc")
    )
    assert all(r.ok for r in synth.select(luhn_valid(F.col("cc")).alias("ok")).collect())
    # detection: too-short runs are not candidates; invalid runs counted
    # as candidates but not valid
    doc = spark.createDataFrame(
        [(1, "pay 4111111111111111 ref 4111111111111112 id 123456")],
        "doc_id long, text string",
    )
    r = cc_detect(doc, "doc_id").collect()[0]
    assert (r.n_candidates, r.n_valid, r.valid_ccs) == (2, 1, "4111111111111111")
