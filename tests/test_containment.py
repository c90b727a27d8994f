"""Containment-join semantics + randomized exact-recall sweep for the
prefix-filtered Jaccard join (seeded corpora, irrational-ish thresholds —
the float-boundary class the ADVICE r4 finding flagged)."""

from __future__ import annotations

import random

from thymeflow_back_spark.operators.dedup import (
    containment_near_dups,
    jaccard_near_dups,
    prefix_filtered_near_dups,
)


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.split(" ") if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_containment_matches_bruteforce_and_is_directional(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = [
        (1, base),  # short doc
        (2, base + " and then a very long tail " * 5),  # contains doc 1
        (3, "completely different words in this one entirely unrelated text"),
        (4, base),  # exact duplicate of 1
    ]
    t = 0.6
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["src_id"], r["dst_id"], r["n_common"])
        for r in containment_near_dups(df, "doc_id", "text", 3, t).collect()
    }
    want = set()
    sh = {i: _shingles(txt) for i, txt in docs}
    for a, _ in docs:
        for b, _ in docs:
            if a == b or not sh[a]:
                continue
            inter = len(sh[a] & sh[b])
            if inter / len(sh[a]) >= t:
                want.add((a, b, inter))
    assert got == want
    # directionality: the short doc is contained in the long one, not
    # vice versa
    assert (1, 2, len(sh[1] & sh[2])) in got
    assert all(not (s == 2 and d == 1) for s, d, _ in got)


def test_prefix_filter_exact_recall_random_sweep(spark):
    """prefix_filtered_near_dups must return EXACTLY the plain-join pairs
    for random corpora and thresholds that are not dyadic rationals."""
    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(rng.randint(6, 25))]
        docs.append((i, " ".join(base)))
        if rng.random() < 0.5:  # plant near-dups: mutate a copy
            mut = list(base)
            for _ in range(rng.randint(0, 3)):
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
            docs.append((100 + i, " ".join(mut)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.07, 1 / 3, 0.42, 0.7, 0.93):
        plain = {
            (r["a_id"], r["b_id"], r["n_common"])
            for r in jaccard_near_dups(df, "doc_id", "text", 3, t).collect()
        }
        fast = {
            (r["a_id"], r["b_id"], r["n_common"])
            for r in prefix_filtered_near_dups(df, "doc_id", "text", 3, t).collect()
        }
        assert fast == plain, f"threshold {t}: {fast ^ plain}"
    assert plain or True  # sweep ran; emptiness at t=0.93 is acceptable
