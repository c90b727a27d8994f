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

Byte-level variant (GPT-2's actual tokenizer — Radford et al. 2019):
units are GPT-2 pretokens (operators/text.py PRETOKEN_REGEX, JVM-side),
initial symbols are the UTF-8 BYTES of each pretoken mapped through the
reversible bytes->printable-unicode table (:func:`bytes_to_unicode`), and
there is no end-of-word marker — word boundaries live in the pretokens
themselves (the leading-space convention: 'Ġ' opens a new word). The
byte mapping runs only over the DISTINCT pretoken-shape table; the
corpus-scale pretokenize stays a JVM regexp. Training and encoding reuse
the exact same pair-count / merge / memo machinery as the char-level
form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"

# Opt-in cross-query model cache (the set_pq_cache pattern): a trained
# merge list is a BUILD-ONCE artifact — a real pipeline trains the
# tokenizer once and serves it everywhere — so a harness running several
# BPE queries over the same corpus should not re-run the merge-learning
# driver rounds per query/rep. Keyed by corpus plan (semanticHash +
# schema string, the pq.py collision discipline) + trainer parameters;
# OFF by default. Driver-side lists of string pairs only — no pinned
# executor state, so disabling just drops the dict.
_MODEL_CACHE: dict | None = None


def set_bpe_model_cache(enabled: bool) -> None:
    """Opt-in memoization of trained merge lists across queries."""
    global _MODEL_CACHE
    _MODEL_CACHE = {} if enabled else None


def _model_cache_key(df: DataFrame, tag: tuple) -> tuple | None:
    if _MODEL_CACHE is None:
        return None
    return (df.semanticHash(), str(df.schema), *tag)


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


def _apply_merges(symed: DataFrame, batch: list[tuple[str, str]]) -> DataFrame:
    """Apply a list of merges IN ORDER in one Arrow pass (m merges for the
    price of one mapInPandas plan node)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for s in pdf["syms"]:
                syms = list(s)
                for a, b in batch:
                    syms = _merge_pair(syms, a, b)
                out.append(syms)
            pdf["syms"] = out
            yield pdf

    return symed.mapInPandas(run, "word string, count long, syms array<string>")


def train_bpe_batched(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    batch: int = 8,
    candidates: int | None = None,
    return_counts: bool = False,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """Learn merges in rounds of up to ``batch`` at a time — BIT-IDENTICAL
    to :func:`train_bpe`'s one-merge loop, with up to batch-fold fewer
    driver rounds (the standard batched-BPE trick, made exact).

    Batched BPE is only equal to sequential BPE when no accepted merge can
    change what the next selection would have been. Each round therefore
    accepts the maximal PROVABLY-SAFE prefix of the ranked candidate list:

    - *Disjointness*: a candidate (c, d) must share no symbol with any
      accepted merge (a, b) or its product a+b, and its own product c+d
      must be a fresh symbol — then applying (a, b) cannot change the
      count of (c, d).
    - *Created-pair dominance*: merging (a, b) creates only pairs adjacent
      to a merge site, so every created pair's weighted count is bounded by
      C = min(count(a,b), max(M_end[a], M_start[b], C_prev)), where
      M_end[a] / M_start[b] are the max counts of existing pairs ending at
      ``a`` / starting at ``b`` (the created pair (x, ab) needs an (x, a)
      occurrence; (ab, y) needs (b, y); run-merges (ab, ab) need (b, a);
      C_prev folds in pairs created by earlier merges of the same round).
      A candidate is accepted only while its count strictly exceeds every
      accepted merge's bound — then no created pair can outrank or tie it.

    The first candidate that fails either check ends the round (skipping
    it would break the sequential order), the accepted merges apply in one
    Arrow pass, and the next round recounts. Worst case (every adjacent
    candidate interacting) degenerates to one merge per round — sequential
    behavior, never a wrong model. Golden-tested equal to ``train_bpe``
    and the local dict reference in tests/test_bpe.py.

    ``candidates`` caps the per-round collect (default 4*batch ranked
    pairs — driver state stays O(batch), never vocabulary-sized).
    ``return_counts`` appends each merge's weighted pair count (the value
    the selection maximized) — (a, b, count) triples.
    """
    ck = _model_cache_key(
        df, ("char", text_col, num_merges, batch, candidates, return_counts)
    )
    if ck is not None and ck in _MODEL_CACHE:
        return _MODEL_CACHE[ck]
    symed = _initial_symbols(word_shapes(df, text_col))
    out = _train_batched_core(symed, num_merges, batch, candidates, return_counts)
    if ck is not None:
        _MODEL_CACHE[ck] = out
    return out


def _train_batched_core(
    symed: DataFrame,
    num_merges: int,
    batch: int,
    candidates: int | None,
    return_counts: bool,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """The batched merge-learning loop over a prepared (word, count, syms)
    relation — shared by the char-level and byte-level trainers (the loop
    is symbol-agnostic; only the initial symbolization differs)."""
    if batch < 1:
        raise ValueError("batch must be >= 1")
    n_cand = candidates or 4 * batch
    symed = symed.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    counts_log: list[int] = []
    while len(merges) < num_merges:
        counts = _pair_counts(symed).persist()
        try:
            cands = (
                counts.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
                .limit(n_cand)
                .collect()
            )
            if not cands or cands[0].pair_count < 2:
                break
            firsts = {r.a for r in cands}
            seconds = {r.b for r in cands}
            # per-symbol max pair counts, aggregated BEFORE collecting:
            # driver state is O(#candidate symbols), never vocabulary-sized.
            # Both sides ride in ONE union -> one job per round instead of
            # two sequential collects over the persisted counts.
            sym_rows = (
                counts.filter(F.col("a").isin(seconds))
                .groupBy(F.col("a").alias("s"))
                .agg(F.max("pair_count").alias("c"))
                .withColumn("side", F.lit("start"))
                .unionByName(
                    counts.filter(F.col("b").isin(firsts))
                    .groupBy(F.col("b").alias("s"))
                    .agg(F.max("pair_count").alias("c"))
                    .withColumn("side", F.lit("end"))
                )
                .collect()
            )
        finally:
            counts.unpersist()
        m_start = {r.s: r.c for r in sym_rows if r.side == "start"}  # max count of (b_cand, y)
        m_end = {r.s: r.c for r in sym_rows if r.side == "end"}  # max count of (x, a_cand)

        accepted: list[tuple[str, str]] = []
        used: set[str] = set()
        bound = 0  # max created-pair count over accepted merges
        for r in cands:
            if len(accepted) >= batch or len(merges) + len(accepted) >= num_merges:
                break
            a, b, n = r.a, r.b, r.pair_count
            if n < 2:
                break
            if accepted:
                if a in used or b in used or (a + b) in used or n <= bound:
                    break
                bound_here = min(
                    n, max(m_end.get(a, 0), m_start.get(b, 0), bound)
                )
            else:
                bound_here = min(n, max(m_end.get(a, 0), m_start.get(b, 0)))
            accepted.append((a, b))
            counts_log.append(int(n))
            used |= {a, b, a + b}
            bound = max(bound, bound_here)
        if not accepted:
            break
        merges.extend(accepted)
        symed = _apply_merges(symed, accepted).localCheckpoint(eager=True)
    if return_counts:
        return [(a, b, c) for (a, b), c in zip(merges, counts_log)]
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


# Per-worker shape memo for bpe_encode: natural-text word shapes repeat
# heavily (Zipf), so each Python worker encodes a given shape ONCE per
# model and serves every later occurrence from a dict — the training-side
# distinct-shape trick applied to encoding. Keyed by the merge list so a
# worker serving two models never cross-contaminates; bounded so a
# pathological high-cardinality corpus (random strings) cannot grow the
# worker heap without limit. Python workers are reused across tasks
# (spark.python.worker.reuse), so the memo amortizes across the whole job.
_ENCODE_MEMOS: dict[tuple, dict[str, list[str]]] = {}
_ENCODE_MEMO_MAX_MODELS = 4
_ENCODE_MEMO_MAX_SHAPES = 1_000_000


def _model_memo(
    merges: list[tuple[str, str]], mode: str = "char"
) -> dict[str, list[str]]:
    # mode rides in the key: a char-level and a byte-level model with the
    # same merge list encode differently (EOW vs byte symbols)
    key = (mode, tuple(merges))
    memo = _ENCODE_MEMOS.get(key)
    if memo is None:
        if len(_ENCODE_MEMOS) >= _ENCODE_MEMO_MAX_MODELS:
            _ENCODE_MEMOS.clear()
        memo = _ENCODE_MEMOS[key] = {}
    return memo


def _encode_word(word: str, merges: list[tuple[str, str]], memo: dict[str, list[str]]) -> list[str]:
    toks = memo.get(word)
    if toks is None:
        toks = list(word) + [EOW]
        for a, b in merges:
            if len(toks) == 1:
                break  # fully merged; remaining merges are no-ops
            toks = _merge_pair(toks, a, b)
        if len(memo) < _ENCODE_MEMO_MAX_SHAPES:
            memo[word] = toks
    return toks


# Above this many merges, the list ships to executors as a Spark BROADCAST
# variable (torrent-distributed once per executor) instead of riding
# serialized inside every task's UDF closure — the coreset.py
# CENTER_LITERAL_MAX crossover, applied to the Python side. At 12 training
# merges the closure is trivially small; at a realistic 32k-merge vocab it
# would inflate every task payload.
BPE_MERGES_LITERAL_MAX = 4096


def _ship_merges(df: DataFrame, merges, merges_mode: str):
    """(broadcast_or_None, closure_list) per the crossover policy."""
    if merges_mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown merges_mode {merges_mode!r}")
    use_bcast = merges_mode == "broadcast" or (
        merges_mode == "auto" and len(merges) > BPE_MERGES_LITERAL_MAX
    )
    if use_bcast:
        return df.sparkSession.sparkContext.broadcast(list(merges)), None
    return None, list(merges)


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    merges_mode: str = "auto",
) -> DataFrame:
    """Add a ``bpe_tokens`` array<string> column encoding ``text_col``.

    The merge list ships inside the Arrow-batched UDF's closure while it
    is plan-sized, and flips to a Spark broadcast variable past
    ``BPE_MERGES_LITERAL_MAX`` entries (``merges_mode`` forces either;
    results are bit-identical — pytest pins both modes). Semantics are
    the sequential replay of the learned merge list per word (identical
    to :func:`encode_words` — the q_bpe_train oracle's definition); cost
    is amortized by the per-worker shape memo above, so a shape is
    replayed against the merge list once per worker, not once per
    occurrence — at a realistic 32k-merge vocab the replay constant only
    ever applies to the (log-scale) distinct-shape set.
    """
    bc, lit = _ship_merges(df, merges, merges_mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mlist = bc.value if bc is not None else lit
        memo = _model_memo(mlist)
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                row: list[str] = []
                for w in (text or "").split(" "):
                    if w:
                        row.extend(_encode_word(w, mlist, memo))
                toks.append(row)
            pdf = pdf.copy()
            pdf["bpe_tokens"] = toks
            yield pdf

    fields = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes
    )
    return df.mapInPandas(run, f"{fields}, bpe_tokens array<string>")


# --- Byte-level BPE (GPT-2's formulation) ------------------------------------


def bytes_to_unicode() -> dict[int, str]:
    """The reversible byte -> printable-unicode table of GPT-2 (Radford et
    al. 2019, public `bpe` reference): printable latin-1 bytes map to
    themselves, the rest to code points 256+ in byte order, so every byte
    string becomes a visible unicode string with no whitespace/control
    characters (space is 'Ġ' = chr(288), newline 'Ċ'). Re-derived from
    the published algorithm."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    table = {b: chr(b) for b in keep}
    n = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + n)
            n += 1
    return table


def pretoken_shapes(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over GPT-2 pretokens — the byte-level shape table.
    The pretokenize is a pure JVM regexp over the corpus (operators/
    text.py pretokens_col); only the distinct shapes flow further."""
    from .skew import spread_small_input
    from .text import pretokens_col

    return (
        spread_small_input(df)
        .select(F.explode(pretokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _initial_symbols_bytes(shapes: DataFrame) -> DataFrame:
    """(word, count, syms): UTF-8 bytes mapped through bytes_to_unicode,
    one symbol per byte, NO end-of-word marker. Runs over the distinct
    shape table only (log-scale in corpus size), so the Python cost is
    bounded by vocabulary, not data."""
    b2u = bytes_to_unicode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [
                [b2u[b] for b in w.encode("utf-8")] for w in pdf["word"]
            ]
            yield pdf

    return shapes.mapInPandas(
        run, "word string, count long, syms array<string>"
    ).filter(F.size("syms") > 1)


def train_bpe_bytelevel(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    batch: int = 8,
    candidates: int | None = None,
    return_counts: bool = False,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """Byte-level BPE training: GPT-2 pretokens, byte symbols, the same
    provably-exact batched merge loop as :func:`train_bpe_batched`."""
    ck = _model_cache_key(
        df, ("byte", text_col, num_merges, batch, candidates, return_counts)
    )
    if ck is not None and ck in _MODEL_CACHE:
        return _MODEL_CACHE[ck]
    symed = _initial_symbols_bytes(pretoken_shapes(df, text_col))
    out = _train_batched_core(symed, num_merges, batch, candidates, return_counts)
    if ck is not None:
        _MODEL_CACHE[ck] = out
    return out


def _encode_pretoken(
    word: str,
    merges: list[tuple[str, str]],
    memo: dict[str, list[str]],
    b2u: dict[int, str],
) -> list[str]:
    toks = memo.get(word)
    if toks is None:
        toks = [b2u[b] for b in word.encode("utf-8")]
        for a, b in merges:
            if len(toks) == 1:
                break
            toks = _merge_pair(toks, a, b)
        if len(memo) < _ENCODE_MEMO_MAX_SHAPES:
            memo[word] = toks
    return toks


def bpe_encode_bytelevel(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    merges_mode: str = "auto",
) -> DataFrame:
    """Add a ``bpe_tokens`` array<string> column: GPT-2 pretokenize (the
    SAME JVM regexp column as training — Python's ``re`` lacks ``\\p{L}``,
    so the split never re-implements the pattern), byte-map, replay the
    merge list per DISTINCT pretoken shape via the per-worker memo.
    Tokens are in the mapped alphabet ('Ġhello'); mapping back to bytes
    is the b2u inverse. The merge list ships per the same
    closure/broadcast crossover as :func:`bpe_encode`."""
    from .text import pretokens_col

    b2u = bytes_to_unicode()
    pre_col = "__pretoks"
    bc, lit = _ship_merges(df, merges, merges_mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mlist = bc.value if bc is not None else lit
        memo = _model_memo(mlist, mode="byte")
        for pdf in batches:
            toks = []
            for pres in pdf[pre_col]:
                row: list[str] = []
                for w in pres:
                    row.extend(_encode_pretoken(w, mlist, memo, b2u))
                toks.append(row)
            pdf = pdf.drop(columns=[pre_col])
            pdf["bpe_tokens"] = toks
            yield pdf

    fields = ", ".join(f"{name} {dtype}" for name, dtype in df.dtypes)
    return df.withColumn(pre_col, pretokens_col(text_col)).mapInPandas(
        run, f"{fields}, bpe_tokens array<string>"
    )


# --- Model artifacts ----------------------------------------------------------


def save_merges(merges: list[tuple[str, str]], path: str, mode: str = "char") -> None:
    """Persist a trained merge list as a JSON artifact (atomic publish:
    temp file + rename, so a reader never sees a torn model). The model
    IS the ordered pair list — engine-independent by design."""
    import json
    import os
    import uuid

    payload = {"format": "bpe-merges", "version": 1, "mode": mode,
               "merges": [[a, b] for a, b in merges]}
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False)
    os.replace(tmp, path)


def load_merges(path: str) -> tuple[list[tuple[str, str]], str]:
    """Load a merge list saved by :func:`save_merges`; returns
    (merges, mode) where mode is 'char' or 'byte'."""
    import json

    with open(path, encoding="utf-8") as f:
        payload = json.load(f)
    if payload.get("format") != "bpe-merges":
        raise ValueError(f"{path}: not a bpe-merges artifact")
    return [(a, b) for a, b in payload["merges"]], payload.get("mode", "char")


def bpe_vocab(merges: list[tuple[str, str]], mode: str = "char") -> list[str]:
    """The model's token inventory in rank order: for byte-level models
    the 256 mapped byte symbols then each merge's product; for char-level
    models the products only (the base alphabet is corpus-defined)."""
    base = list(bytes_to_unicode().values()) if mode == "byte" else []
    return base + [a + b for a, b in merges]
