"""Distributed BPE (byte-pair encoding) tokenizer training and encoding.

The classic merge-learning loop (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") re-expressed for a corpus
that does not fit one machine:

- The corpus collapses to a WEIGHTED WORD-SHAPE table ``(word, count)``
  once (one groupBy). Everything after runs on distinct shapes weighted by
  count — the standard trick, and the thing that makes 100 TB feasible:
  distinct word shapes grow ~log-scale with corpus size.
- Each iteration: explode adjacent symbol pairs per shape (map-side),
  weight by shape count, one groupBy finds the max-count pair
  (deterministic tie-break: lexicographic smallest), and a map-side
  transform applies the merge to every shape. 2 shuffle-light jobs per
  merge; the learned merge list (driver-side, ~vocab_size entries) is the
  model.
- Word shapes are symbol ARRAYS; merge application is a linear in-row scan
  (Arrow-batched pandas UDF — inherently sequential per word, the one
  place Python is warranted per SURVEY §7).

Encoding applies the merge list in learned order per word — same pandas
UDF machinery, usable on any engine's output because the model is just an
ordered list of string pairs.

End-of-word marker: '</w>' is appended as its own initial symbol so merges
can distinguish suffixes (the original formulation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_shapes(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over whitespace tokens — the weighted shape table."""
    from .skew import spread_small_input

    return (
        spread_small_input(df)
        .selectExpr(f"explode(filter(split({text_col}, ' '), t -> t != '')) as word")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _initial_symbols(shapes: DataFrame) -> DataFrame:
    """(word, count, syms array<string>): characters + end-of-word marker."""
    return shapes.selectExpr(
        "word",
        "count",
        f"concat(transform(split(word, ''), c -> c), array('{EOW}')) as syms",
    ).filter(F.size("syms") > 1)


def _pair_counts(symed: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts: (a, b, pair_count)."""
    # fully-merged shapes have ONE symbol: sequence(0, -1) would step
    # DESCENDING in Spark, so guard to an empty index array instead
    pairs = symed.selectExpr(
        "count",
        "explode(transform("
        " if(size(syms) >= 2, sequence(0, size(syms) - 2), cast(array() as array<int>)),"
        " i -> struct(syms[i] as a, syms[i + 1] as b))) as p",
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("count").alias("pair_count"))


def _merge_pair(syms: list[str], a: str, b: str) -> list[str]:
    """Replace every adjacent (a, b) with a+b, scanning left to right.

    The ONE definition of the merge procedure: training (_apply_merge) and
    encoding (encode_words) both call it, so a trained model's merges
    always replay identically at encode time."""
    ab = a + b
    merged: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            merged.append(ab)
            i += 2
        else:
            merged.append(syms[i])
            i += 1
    return merged


def _apply_merge(symed: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) with the merged symbol, left to right."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [_merge_pair(list(s), a, b) for s in pdf["syms"]]
            yield pdf

    return symed.mapInPandas(run, "word string, count long, syms array<string>")


def train_bpe(df: DataFrame, text_col: str, num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges; returns them in order.

    Deterministic: the best pair maximizes count, ties broken by (a, b)
    lexicographically — same corpus, same model, any cluster.
    """
    symed = _initial_symbols(word_shapes(df, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(symed)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_count < 2:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        # localCheckpoint: truncate the per-iteration plan lineage (each
        # merge otherwise nests another mapInPandas over the previous plan)
        symed = _apply_merge(symed, a, b).localCheckpoint(eager=True)
    return merges


def encode_words(words: list[str], merges: list[tuple[str, str]]) -> list[list[str]]:
    """Driver-side reference encoder: apply merges in learned order."""
    out = []
    for w in words:
        syms = list(w) + [EOW]
        for a, b in merges:
            syms = _merge_pair(syms, a, b)
        out.append(syms)
    return out


def bpe_encode(df: DataFrame, text_col: str, merges: list[tuple[str, str]]) -> DataFrame:
    """Add a ``bpe_tokens`` array<string> column encoding ``text_col``.

    The merge list ships as a broadcast-sized Python literal inside the
    Arrow-batched UDF; per-row work is linear in text length × merges.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                words = [w for w in (text or "").split(" ") if w]
                toks.append([s for ws in encode_words(words, merges) for s in ws])
            pdf = pdf.copy()
            pdf["bpe_tokens"] = toks
            yield pdf

    fields = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes
    )
    return df.mapInPandas(run, f"{fields}, bpe_tokens array<string>")
