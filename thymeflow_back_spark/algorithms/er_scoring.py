"""Entity-resolution scoring: bipartite term matching + normalized
soft-TF-IDF equality probabilities.

Behavioral parity with the reference's EntityResolution trait
(EntityResolution.scala:19-140) and BipartiteMatchingDistance
(BipartiteMatchingDistance.scala:11-55):

- terms of two names are aligned by a min-cost bipartite assignment over a
  string-distance matrix (Hungarian); assigned pairs within the distance
  threshold match 1:1, and the leftover unmatched terms of both sides are
  concatenated and compared as one final group (so "Anne Marie" vs
  "Annemarie" still aligns).
- the equality probability is matched-TF-IDF-mass / total-TF-IDF-mass
  weighted by per-group similarity (NOT cosine — the reference's
  normalizedSoftTFIDF), capped at 1.
- Vanilla mode scores all name pairs and averages by name-weight products
  (getNamesEqualityProbability); name-part modes score one merged weighted
  term bag per agent (getNameTermsEqualityProbability).

All functions are per-pair local (lists in, float out) and run inside
Arrow-batched UDFs; nothing here touches Spark.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from .matching import hungarian
from .strings import levenshtein

Match = tuple[list[int], list[int], float]


def levenshtein_similarity(a: str, b: str) -> float:
    """Lucene LevensteinDistance semantics: 1 - dist/max(len)."""
    if not a and not b:
        return 1.0
    m = max(len(a), len(b))
    return 1.0 - levenshtein(a, b) / m


def matching_term_indices(
    terms1: Sequence[str],
    terms2: Sequence[str],
    similarity: Callable[[str, str], float] = levenshtein_similarity,
    distance_threshold: float = 1.0,
) -> list[Match]:
    """Align two term sequences; returns [(indices1, indices2, similarity)].

    Assigned pairs beyond the distance threshold are dropped; remaining
    unassigned terms are joined with spaces and compared as a single group
    (BipartiteMatchingDistance.matchIndices)."""
    if not terms1 or not terms2:
        return []
    dist = [[1.0 - similarity(u, v) for v in terms2] for u in terms1]
    _, assignment = hungarian(dist)
    out: list[Match] = []
    used1: set[int] = set()
    used2: set[int] = set()
    for u, v in enumerate(assignment):
        if v != -1 and dist[u][v] <= distance_threshold:
            used1.add(u)
            used2.add(v)
            out.append(([u], [v], 1.0 - dist[u][v]))
    if len(used1) < min(len(terms1), len(terms2)):
        rem1 = [i for i in range(len(terms1)) if i not in used1]
        rem2 = [i for i in range(len(terms2)) if i not in used2]
        d = 1.0 - similarity(" ".join(terms1[i] for i in rem1), " ".join(terms2[i] for i in rem2))
        if d <= distance_threshold:
            out.append((rem1, rem2, 1.0 - d))
    return out


def normalized_soft_tfidf(
    tfidf1: Sequence[float], tfidf2: Sequence[float], matches: Sequence[Match]
) -> float:
    """matched-mass / total-mass similarity (EntityResolution.scala:77-90)."""
    denominator = sum(tfidf1) + sum(tfidf2)
    if denominator == 0.0:
        return 0.0
    numerator = sum(
        (sum(tfidf1[i] for i in idx1) + sum(tfidf2[j] for j in idx2)) * sim
        for idx1, idx2, sim in matches
    )
    return min(numerator / denominator, 1.0)


def name_terms_equality_probability(
    terms1: Sequence[tuple[str, float]],
    terms2: Sequence[tuple[str, float]],
    idf: dict[str, float],
    distance_threshold: float = 1.0,
) -> float:
    """Merged weighted-term-bag scoring (name-part solve modes)."""
    if not terms1 or not terms2:
        return 0.0
    matches = matching_term_indices(
        [t for t, _ in terms1], [t for t, _ in terms2], distance_threshold=distance_threshold
    )
    tfidf1 = [w * idf.get(t, 0.0) for t, w in terms1]
    tfidf2 = [w * idf.get(t, 0.0) for t, w in terms2]
    return normalized_soft_tfidf(tfidf1, tfidf2, matches)


def deduplicate_name_parts(
    names: Sequence[tuple[list[str], float]],
    typed_parts: Sequence[tuple[list[str], str]],
    distance_threshold: float = 1.0,
) -> list[tuple[str, float, list[str]]]:
    """Reconcile an agent's name variants into primary single-token parts.

    Port of deduplicateEntityNameParts/deduplicateNameParts semantics
    (AgentMatchEnricher.scala:744-889): every pair of name variants is
    term-aligned; aligned term groups merge via union-find across variants;
    each merged group's weight is the sum of its single-token occurrences'
    weights and it collects any explicit name-part types (givenName /
    familyName) contributed by typed variants. Returns
    [(token, weight, types)] sorted by (#types desc, weight desc) — the
    agent's deduplicated primary name parts.
    """
    entries: list[tuple[list[str], float, str | None]] = [
        (terms, w, None) for terms, w in names
    ] + [(terms, 0.0, t) for terms, t in typed_parts]
    parent: dict[tuple[int, tuple[int, ...]], tuple[int, tuple[int, ...]]] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    nodes: set[tuple[int, tuple[int, ...]]] = set()
    for i in range(len(entries)):
        for j in range(i + 1, len(entries)):
            for idx1, idx2, _ in matching_term_indices(
                entries[i][0], entries[j][0], distance_threshold=distance_threshold
            ):
                n1, n2 = (i, tuple(idx1)), (j, tuple(idx2))
                nodes.add(n1)
                nodes.add(n2)
                union(n1, n2)
    used: set[tuple[int, int]] = {(e, i) for e, idxs in nodes for i in idxs}
    for e, (terms, _, _) in enumerate(entries):
        for i in range(len(terms)):
            if (e, i) not in used:
                nodes.add((e, (i,)))

    groups: dict[tuple[int, tuple[int, ...]], list[tuple[int, tuple[int, ...]]]] = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)

    out: list[tuple[str, float, list[str]]] = []
    for members in groups.values():
        # reconcile by distinct term sequence within the group
        by_terms: dict[tuple[str, ...], tuple[float, list[str]]] = {}
        for e, idxs in members:
            terms, w, t = entries[e]
            key = tuple(terms[i] for i in idxs)
            cur_w, cur_t = by_terms.get(key, (0.0, []))
            by_terms[key] = (cur_w + w, cur_t + ([t] if t else []))
        singles = [
            (key[0], w, types) for key, (w, types) in by_terms.items() if len(key) == 1
        ]
        if not singles:
            continue
        singles.sort(key=lambda x: (-len(x[2]), -x[1], x[0]))
        token = singles[0][0]
        weight = sum(w for _, w, _ in singles)
        types = sorted({t for _, _, ts in singles for t in ts})
        out.append((token, weight, types))
    out.sort(key=lambda x: (-len(x[2]), -x[1], x[0]))
    return out


def names_equality_probability(
    names1: Sequence[tuple[list[str], float]],
    names2: Sequence[tuple[list[str], float]],
    idf: dict[str, float],
    distance_threshold: float = 1.0,
) -> float:
    """Vanilla scoring: weighted average of per-name-pair probabilities
    (weights = name-weight products; EntityResolution.scala:92-116).
    Names are passed pre-tokenized."""
    weight = 0.0
    normalization = 0.0
    for terms1, w1 in names1:
        for terms2, w2 in names2:
            if terms1 and terms2:
                matches = matching_term_indices(terms1, terms2, distance_threshold=distance_threshold)
                tfidf1 = [idf.get(t, 0.0) for t in terms1]
                tfidf2 = [idf.get(t, 0.0) for t in terms2]
                p = normalized_soft_tfidf(tfidf1, tfidf2, matches)
                weight += w1 * w2 * p
                normalization += w1 * w2
    if normalization == 0.0:
        return 0.0
    return min(weight / normalization, 1.0)
