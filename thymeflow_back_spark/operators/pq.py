"""Product quantization (PQ) with asymmetric-distance (ADC) search.

The missing rung of the quantization ladder next to scalar int8
(operators/quantize.py) and the IVF coarse quantizer (operators/ivf.py):
PQ (Jégou et al. 2011, "Product quantization for nearest neighbor
search") splits each d-dim vector into m subvectors, k-means-quantizes
each subspace independently, and stores a vector as m small codes —
64 dims become 8 bytes at m=8/k=16, a 32× compression that lets a
100 TB embedding corpus fit its code table in a fraction of the space.
Search is ADC: the query precomputes an m×k table of exact
query-subvector-to-centroid distances, and each candidate costs m table
LOOKUPS + m-1 adds instead of a d-dim dot product.

Determinism (the oracle contract): codebooks derive from the same
content-addressed seeds as IVF (the k vectors with smallest md5(id),
sliced per subspace) plus fixed Lloyd rounds; all distances use the
||x||² + ||c||² - 2·x·c identity over the proven ordered-fold dot
(operators/similarity.dot ≡ DuckDB list_dot_product on these
float32-origin values); per-pair ADC sums are CHAINED in subspace order
(j = 0..m-1), never an unordered SUM, so every engine folds the same
doubles in the same order. Ties in code assignment break to the lowest
code, in ranking to the lowest vec_id.

Scale shape: codebooks ride as a ONE-row broadcast relation (data, not
literal expression trees — see codebook_row for the optimizer-blow-up
this avoids); encoding is a narrow projection over the corpus crossed
with that row (no shuffle); the ADC distance table is queries×m×k rows
JOINED BROADCAST per subspace — the corpus-code table streams through m
map-side hash lookups with zero shuffle, and only the per-query top-k
tail shuffles k rows per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cachereg import pin
from .ivf import seed_centroids
from .similarity import SCORE_DECIMALS, as_double_array

PQ_M = 8  # subspaces
PQ_K = 16  # codes per subspace

# Opt-in cross-query index cache (the set_shingle_cache pattern): a PQ
# index is a BUILD-ONCE artifact — at scale it's materialized like
# ivf_write_index's parquet — so a harness running several PQ queries
# over the same corpus should not re-train codebooks / re-encode per
# query. Keyed by plan semanticHash + parameters; OFF by default (pinning
# corpus-sized code tables is a per-run capacity decision).
_PQ_CACHE: dict | None = None


def set_pq_cache(enabled: bool) -> None:
    """Opt-in memoization of trained codebooks and the persisted code
    table across queries (see comment above). Disabling unpersists any
    cached code tables."""
    global _PQ_CACHE
    if enabled:
        if _PQ_CACHE is None:
            _PQ_CACHE = {}
    elif _PQ_CACHE is not None:
        for v in _PQ_CACHE.values():
            if isinstance(v, DataFrame):
                v.unpersist()
        _PQ_CACHE = None


def _plan_key(df: DataFrame) -> tuple:
    """Cache key for a corpus plan: semanticHash is a 32-bit plan hash, so
    two different corpora in one session could collide and silently serve
    the wrong codebooks/codes — ride the schema string along as a cheap
    disambiguator (collisions now also need identical schemas)."""
    return (df.semanticHash(), str(df.schema))


def _sub(vec: Column, j: int, sub_d: int) -> Column:
    return F.slice(vec, j * sub_d + 1, sub_d)


def _chain_sum(terms: list[Column]) -> Column:
    """Left-to-right chained sum. Bit-identical to the ordered fold from
    0.0 (operators/similarity.dot / DuckDB list_dot_product): IEEE addition
    has 0.0 + a == a exactly, so dropping the leading zero changes nothing."""
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _dot_col(x: Column, c: Column) -> Column:
    """x · c over two array COLUMNS: the ordered fold from 0.0 (IEEE:
    0.0 + a == a exactly, products fold in element order), bit-identical to
    DuckDB's list_dot_product — proven by the PQ/IVF-PQ oracle hash
    matches. The expression is a handful of nodes anchored on column
    references, so optimizer substitution through it stays O(1). Never
    unroll a literal codeword into per-element arithmetic instead: a join
    above such an expression makes the optimizer SUBSTITUTE alias
    definitions while pushing inferred IsNotNull filters, and
    literal-unrolled trees multiply under that substitution (measured: a
    64 KB encode plan became a 119 MB plan / 260 MB task binary with
    codegen compile failures once ADC joins sat on top) — which is why
    codebooks travel as one-row broadcast relations (codebook_row)."""
    return F.aggregate(
        F.zip_with(x, c, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def _self_dot(x: Column, sub_d: int) -> Column:
    """x · x as explicit arithmetic (same fold order as dot())."""
    return _chain_sum(
        [F.element_at(x, i + 1) * F.element_at(x, i + 1) for i in range(sub_d)]
    )


def _cc(c: list[float]) -> float:
    """||c||² as a Python double — left-to-right IEEE sum, identical to the
    constant the engines would fold from the literal expression."""
    out = 0.0
    for v in c:
        out = out + float(v) * float(v)
    return out


def _with_subvectors(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    sub_d: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id[, carry…], x0..x{m-1}, xx0..xx{m-1}) — subvector slices and their
    squared norms hoisted into columns ONCE, so downstream argmin trees
    reference them instead of re-embedding a norm per codeword (16× tree
    blow-up otherwise — the same Catalyst-inlining trap the IVF scores
    array documents).

    Emitted as selectExpr strings: the m×sub_d Column-operator tree for
    the self-dots costs one py4j round-trip per node (~1.5 s of driver
    time at m=4, sub_d=16, measured round 11) on EVERY construction —
    including each warm search. SQL text parses in milliseconds; the
    arithmetic (slice after the double cast, left-associated self-dot
    chain) is unchanged, so values are bit-identical."""
    v = f"transform(`{vec_col}`, __x -> CAST(__x AS DOUBLE))"
    sliced = corpus.selectExpr(
        f"`{id_col}`",
        *[f"`{c}`" for c in carry],
        *[f"slice({v}, {j * sub_d + 1}, {sub_d}) AS x{j}" for j in range(m)],
    )
    selfdots = [
        "("
        + " + ".join(
            f"element_at(x{j}, {i + 1}) * element_at(x{j}, {i + 1})"
            for i in range(sub_d)
        )
        + f") AS xx{j}"
        for j in range(m)
    ]
    return sliced.selectExpr("*", *selfdots)


def codebook_row(spark, books: list[list[list[float]]]) -> DataFrame:
    """ONE-row codebook relation: (books, ccs) with ``books[j][code]`` the
    codeword array and ``ccs[j][code]`` its ||c||² (_cc fold, identical to
    the double DuckDB's list_dot_product(c, c) produces).

    Why a relation and not literals: the search/encode consumers JOIN on
    derived code columns, and the optimizer pushes inferred IsNotNull
    filters down through the projection stack by substituting each alias's
    definition. Codewords as literal expression trees multiply under that
    substitution — the IVF-PQ plan measured 119 MB (260 MB task binaries,
    whole-stage codegen compile failures). As a broadcast one-row cross
    join (the bounded-by-construction shape of q_dataset_mixture), every
    downstream expression bottoms out at a column reference in a few
    nodes, and the plan stays KB-sized no matter how many joins stack."""
    data = [
        (
            [[list(map(float, c)) for c in book] for book in books],
            [[_cc(c) for c in book] for book in books],
        )
    ]
    return spark.createDataFrame(
        data, "books: array<array<array<double>>>, ccs: array<array<double>>"
    )


def _scores_col(j: int) -> Column:
    """l2² to every codeword of subspace ``j`` over the hoisted columns and
    the one-row codebook: zip_with pairs books[j][code] with ccs[j][code].
    Score = (||x||² + ||c||²) - 2·x·c — identical association to the
    oracle's l2² expression."""
    x, xx = F.col(f"x{j}"), F.col(f"xx{j}")
    return F.zip_with(
        F.element_at("books", j + 1),
        F.element_at("ccs", j + 1),
        lambda c, cc: (xx + cc) - 2 * _dot_col(x, c),
    )


def _with_codes(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[list[float]]],
    keep_subvectors: bool = False,
) -> DataFrame:
    """(id, code0..code{m-1}[, x0..x{m-1}]) — nearest-codeword index per
    subspace, lowest code on ties. Zero shuffle: slices+norms, score
    arrays, and argmins are three narrow projections over the corpus
    crossed with the ONE-row broadcast codebook (see codebook_row for why
    data, not literals). Each score subtree is materialized ONCE — argmin
    references the scores COLUMN twice, which would otherwise clone the
    whole arithmetic tree into array_position and array_min."""
    from .skew import spread_small_input

    m = len(books)
    sub_d = len(books[0][0])
    bdf = codebook_row(corpus.sparkSession, books)
    # the argmin trees below are interpreted higher-order functions — a
    # single-file scan would run them on ONE core (measured 2.5 s -> 0.7 s
    # at sf0.1); no-op when the scan is already wide
    hoisted = _with_subvectors(
        spread_small_input(corpus).crossJoin(F.broadcast(bdf)),
        id_col, vec_col, m, sub_d,
        carry=("books", "ccs"),
    )
    carry = [F.col(f"x{j}") for j in range(m)] if keep_subvectors else []
    scored = hoisted.select(
        F.col(id_col),
        *carry,
        *[_scores_col(j).alias(f"scores{j}") for j in range(m)],
    )
    return scored.select(
        F.col(id_col),
        *carry,
        *[
            (
                F.array_position(F.col(f"scores{j}"), F.array_min(F.col(f"scores{j}"))) - 1
            )
            .cast("int")
            .alias(f"code{j}")
            for j in range(m)
        ],
    )


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = 1,
) -> list[list[list[float]]]:
    """``books[j][code]`` = centroid of subspace ``j`` — content-addressed
    seeds + fixed Lloyd rounds per subspace; empty codes keep their seed.

    Each Lloyd round is ONE pass: every row emits its m (subspace, code,
    subvector) assignments through an inline explode, and a single
    (j, code)-keyed aggregate produces all m·k means (m·k rows × sub_d
    sum columns after map-side combine) — not m separate corpus scans."""
    ck = None
    if _PQ_CACHE is not None:
        ck = ("books", _plan_key(corpus), id_col, vec_col, m, k, iterations)
        cached = _PQ_CACHE.get(ck)
        if cached is not None:
            return cached
    seeds = seed_centroids(corpus, id_col, vec_col, k)
    d = len(seeds[0])
    if d % m:
        raise ValueError(f"pq_codebooks: dim {d} not divisible by m={m}")
    sub_d = d // m
    books = [[s[j * sub_d : (j + 1) * sub_d] for s in seeds] for j in range(m)]
    for _ in range(iterations):
        coded = _with_codes(corpus, id_col, vec_col, books, keep_subvectors=True)
        entries = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.col(f"code{j}").alias("code"),
                    F.col(f"x{j}").alias("x"),
                )
                for j in range(m)
            ]
        )
        assigned = coded.select(F.explode(entries).alias("e")).select(
            F.col("e.j").alias("j"), F.col("e.code").alias("code"), F.col("e.x").alias("x")
        )
        sums = (
            assigned.groupBy("j", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at("x", i + 1)).alias(f"s{i}") for i in range(sub_d)],
            )
            .collect()
        )
        nxt = [[list(c) for c in books[j]] for j in range(m)]
        for r in sums:
            nxt[r["j"]][r["code"]] = [r[f"s{i}"] / r["n"] for i in range(sub_d)]
        books = nxt
    if ck is not None:
        _PQ_CACHE[ck] = books
    return books


def _code_table(
    corpus: DataFrame, id_col: str, vec_col: str, books: list[list[list[float]]]
) -> DataFrame:
    """The materialized (id, code0..code{m-1}) table pq_adc_topk probes.

    Materialization is load-bearing either way (see the comment at the
    call site); with the opt-in cache it is ALSO memoized across queries
    — persisted instead of query-scope pinned, keyed by the corpus plan
    and the codebook values."""
    if _PQ_CACHE is not None:
        ck = (
            "codes", _plan_key(corpus), id_col, vec_col,
            tuple(tuple(tuple(c) for c in book) for book in books),
        )
        cached = _PQ_CACHE.get(ck)
        if cached is not None:
            return cached
        out = pq_encode(corpus, id_col, vec_col, books).persist()
        _PQ_CACHE[ck] = out
        return out
    return pin(pq_encode(corpus, id_col, vec_col, books))


def pq_encode(
    corpus: DataFrame, id_col: str, vec_col: str, books: list[list[list[float]]]
) -> DataFrame:
    """(id, code0..code{m-1}) — the m-byte representation, one narrow
    projection over the corpus (no shuffle)."""
    return _with_codes(corpus, id_col, vec_col, books)


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[list[float]]],
    k_results: int,
) -> DataFrame:
    """Per-query ADC top-k: (q_id, vec_id, adc_dist, rank).

    The distance table (q_id, j, code, term) is queries×m×k rows — built
    once from exact query subvectors, then each subspace's slice joins
    BROADCAST against the encoded corpus on (q_id is free, code{j}):
    m map-side lookups per candidate row, an order-fixed chained sum,
    and the per-query top-k window. adc_dist is rounded before ranking
    (SCORE_DECIMALS) so ranking is engine-independent. Self-matches
    (vec_id == q_id) are excluded, matching ivfpq_topk / ivf_topk /
    cosine_topk — when queries are drawn from the corpus, rank 1 would
    otherwise always be the query itself."""
    m = len(books)
    sub_d = len(books[0][0])
    # Materialize the code table before the ADC joins. A PQ index IS a
    # materialized artifact (m small codes per vector — at scale it's
    # written once like ivf.py's cell-partitioned parquet index); keeping
    # it lazy here is also a measured 5× slowdown: each of the m joins
    # pushes an IsNotNull(code_j) inferred filter down into the encode
    # projection, substituting the full interpreted argmin/zip_with tree
    # into the filter and re-evaluating the scoring arithmetic once per
    # join (16k-row ADC at sf0.1: 12.8 s lazy vs 2.7 s pinned).
    codes = _code_table(corpus, id_col, vec_col, books)
    # the ADC table: per query one row carrying the FULL m×k term matrix
    # (terms[j][code] = ||q_j||² + ||c_{j,code}||² - 2·q_j·c_{j,code}) —
    # the only place a query-side dot happens; candidates below never
    # touch raw vectors again. ONE broadcast of queries×m×k doubles and
    # the corpus-code table streams through per-row array lookups — no
    # per-subspace join chain (m broadcast builds collapsed to one).
    qh = _with_subvectors(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col)).crossJoin(
            F.broadcast(codebook_row(queries.sparkSession, books))
        ),
        "q_id",
        vec_col,
        m,
        sub_d,
        carry=("books", "ccs"),
    )
    qterms = qh.select(
        "q_id", F.array(*[_scores_col(j) for j in range(m)]).alias("__terms")
    )
    pairs = codes.withColumnRenamed(id_col, "vec_id").crossJoin(
        F.broadcast(qterms)
    )
    # terms[j][code_j]: the identical doubles the per-subspace join lookups
    # produced, chained in subspace order, never an unordered SUM
    adc = F.element_at(F.element_at("__terms", 1), F.col("code0") + 1)
    for j in range(1, m):
        adc = adc + F.element_at(
            F.element_at("__terms", j + 1), F.col(f"code{j}") + 1
        )
    w = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
    return (
        pairs.filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("adc_dist", F.round(adc, SCORE_DECIMALS))
        .select("q_id", "vec_id", "adc_dist")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_results)
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[list[float]]],
    shortlist: int,
    k_results: int,
) -> DataFrame:
    """ADC shortlist + EXACT rerank: (q_id, vec_id, score, rank).

    The standard serving pattern for quantized indexes (Jégou et al. 2011
    §IV): the compressed codes produce a cheap shortlist of `shortlist`
    candidates per query, then only those rows read their raw vectors for
    an exact cosine, recovering near-exact quality at ADC cost. Scale
    shape: the rerank side is queries×shortlist rows — BROADCAST against
    the corpus, so raw 100 TB vectors are touched by one streaming scan
    and only shortlisted rows do a d-dim dot."""
    from .similarity import dot, norm

    if shortlist < k_results:
        raise ValueError(
            f"shortlist ({shortlist}) must be >= k_results ({k_results}): "
            "the rerank can only reorder candidates the ADC pass surfaced"
        )

    short = pq_adc_topk(corpus, queries, id_col, vec_col, books, shortlist).select(
        "q_id", "vec_id"
    )
    qv = queries.select(
        F.col(id_col).alias("q_id"), as_double_array(F.col(vec_col)).alias("q_vec")
    )
    pairs = short.join(F.broadcast(qv), "q_id")
    cv = corpus.select(
        F.col(id_col).alias("vec_id"), as_double_array(F.col(vec_col)).alias("c_vec")
    )
    ex = cv.join(F.broadcast(pairs), "vec_id").select(
        "q_id",
        "vec_id",
        F.round(
            dot(F.col("q_vec"), F.col("c_vec"))
            / (norm(F.col("q_vec")) * norm(F.col("c_vec"))),
            SCORE_DECIMALS,
        ).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return ex.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k_results
    )
