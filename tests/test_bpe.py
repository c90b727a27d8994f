"""BPE trainer: distributed merge learning vs a local reference, encoding
round-trip properties."""

from __future__ import annotations

from collections import Counter

from thymeflow_back_spark.operators.bpe import (
    EOW,
    bpe_encode,
    encode_words,
    train_bpe,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest new",
]


def local_bpe(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Reference implementation: dict-of-shapes merge loop."""
    counts = Counter(w for t in texts for w in t.split(" ") if w)
    shapes = {w: list(w) + [EOW] for w in counts}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in shapes.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += counts[w]
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest (a, b)
        top_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top_count)
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        for w, syms in shapes.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            shapes[w] = out
    return merges


def test_train_bpe_matches_local_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = train_bpe(df, "text", 12)
    want = local_bpe(CORPUS, 12)
    assert got == want
    assert len(got) >= 8  # the corpus supports a real merge sequence


def test_bpe_encode_roundtrip_and_consistency(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    merges = train_bpe(df, "text", 10)

    # frequent whole words collapse to single tokens
    [enc] = encode_words(["newest"], merges)
    assert enc == ["newest" + EOW] or len(enc) <= 3

    # concatenating the tokens reproduces the text (lossless segmentation)
    encoded = bpe_encode(df, "text", merges)
    for row in encoded.collect():
        joined = "".join(row.bpe_tokens).replace(EOW, " ").rstrip(" ")
        assert joined == row.text

    # distributed encode == driver-side reference encode
    for row in encoded.collect():
        words = [w for w in row.text.split(" ") if w]
        want = [s for ws in encode_words(words, merges) for s in ws]
        assert list(row.bpe_tokens) == want


def test_train_bpe_batched_equals_sequential_on_corpus(spark):
    from thymeflow_back_spark.operators.bpe import train_bpe_batched

    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    want = train_bpe(df, "text", 12)
    for b in (2, 4, 8):
        got = train_bpe_batched(df, "text", 12, batch=b)
        assert got == want, (b, got, want)


def test_train_bpe_batched_equals_sequential_on_documents(spark):
    from thymeflow_back_spark.operators.bpe import train_bpe_batched

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    want = train_bpe(docs, "text", 16)
    got = train_bpe_batched(docs, "text", 16, batch=4)
    assert got == want


def test_train_bpe_batched_respects_num_merges(spark):
    from thymeflow_back_spark.operators.bpe import train_bpe_batched

    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = train_bpe_batched(df, "text", 3, batch=8)
    assert got == train_bpe(df, "text", 3)
    assert len(got) == 3
