"""Sorted-neighborhood near-duplicate detection (Hernandez & Stolfo 1995).

The third blocking strategy in the dedup suite, next to document-frequency
blocking (dedup.py jaccard_near_dups) and MinHash LSH banding: sort the
corpus by a discriminating key, then compare only rows whose GLOBAL sort
ranks are within a fixed window w. Candidate volume is exactly n*(w-1) —
linear in the corpus BY CONSTRUCTION, immune to hot-key skew (a million
identical keys still produce only w-1 candidates per row), which is the
property LSH banding cannot give on adversarial data.

The classic weakness — a duplicate pair whose difference lands inside the
sort key sorts far apart — is answered the classic way: MULTI-PASS, one
pass per key (here: the first prefix_tokens tokens, and the same prefix of
the REVERSED token list, catching head-edited and tail-edited duplicates
respectively). Union the candidate pairs with per-pass provenance, verify
once with the suite's shared exact-Jaccard stage (dedup.py
verify_candidates_arrays), so SNM plugs into the same verify semantics as
every other blocked path.

Distribution: the global rank is the deterministic distributed prefix sum
(packing.py — ONE range exchange, pinned boundary draw), and the
rank-window self-join is an equi-join on rn + k for k in 1..w-1 (explode,
then hash join) — never a windowed cross product. At 100 TB each pass is
one range shuffle + one hash join of n*(w-1) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prefix_key(text_col: str, prefix_tokens: int, reverse: bool) -> F.Column:
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: t != F.lit("")
    )
    if reverse:
        toks = F.reverse(toks)
    return F.concat_ws(" ", F.slice(toks, 1, prefix_tokens))


def snm_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    prefix_tokens: int = 5,
    reverse: bool = False,
) -> DataFrame:
    """Unordered candidate pairs (a_id < b_id) whose sort ranks under the
    (possibly reversed) token-prefix key differ by < ``window``."""
    from .cachereg import pin
    from .packing import distributed_prefix_sum

    if window < 2:
        raise ValueError("window must be >= 2")
    keyed = df.select(
        F.col(id_col).alias("__id"),
        _prefix_key(text_col, prefix_tokens, reverse).alias("__key"),
    )
    # pinned: the ranked relation feeds BOTH sides of the window self-join
    # (probe explode + build), and each side would otherwise replay the
    # rank windows over the cached range exchange
    ranked = pin(
        distributed_prefix_sum(
            keyed, ["__key", "__id"], F.lit(1), out_col="rn"
        ).select("__id", "rn")
    )
    probes = ranked.select(
        F.col("__id").alias("__a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + (window - 1))
        ).alias("rn"),
    )
    # ranks are unique and only the lower-ranked row probes forward, so
    # every unordered pair is emitted exactly once — no distinct needed
    # (a dedup here would be a full shuffle of the n*(w-1) relation)
    return probes.join(ranked, "rn").select(
        F.least("__a", "__id").alias("a_id"),
        F.greatest("__a", "__id").alias("b_id"),
    )


def snm_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    threshold: float,
    shingle_n: int = 3,
    prefix_tokens: int = 5,
) -> DataFrame:
    """Multi-pass SNM: forward-prefix and reversed-prefix passes, candidate
    union with provenance, one shared exact-Jaccard verify.

    Output: (a_id, b_id, n_common, jaccard, in_fwd, in_rev) at
    jaccard >= threshold."""
    from .cachereg import pin
    from .dedup import doc_shingles, verify_candidates_arrays

    fwd = snm_candidates(
        df, id_col, text_col, window, prefix_tokens, reverse=False
    ).select("a_id", "b_id", F.lit(1).alias("in_fwd"), F.lit(0).alias("in_rev"))
    rev = snm_candidates(
        df, id_col, text_col, window, prefix_tokens, reverse=True
    ).select("a_id", "b_id", F.lit(0).alias("in_fwd"), F.lit(1).alias("in_rev"))
    # pinned: consumed by the verify join AND the provenance join-back
    cands = pin(
        fwd.union(rev)
        .groupBy("a_id", "b_id")
        .agg(F.max("in_fwd").alias("in_fwd"), F.max("in_rev").alias("in_rev"))
    )
    sh = doc_shingles(df, id_col, text_col, shingle_n)
    verified = verify_candidates_arrays(
        sh, cands.select("a_id", "b_id"), id_col, threshold
    )
    return verified.join(cands, ["a_id", "b_id"]).select(
        "a_id", "b_id", "n_common", "jaccard", "in_fwd", "in_rev"
    )
