"""PARIS probabilistic entity resolution (reference ParisEnricher.scala:
41-280, after Suchanek/Abiteboul/Senellart's PARIS paper).

Instance-equality probabilities are iterated from statement evidence under
property functionality priors:

- positive evidence (inverse functionality): two instances sharing equal
  objects on an inverse-functional property are likely the same —
  P⁺(x,x') = 1 - Π (1 - invFun(p)·eq(y,y')) over object pairs.
- negative evidence (functionality): a functional property whose object
  values differ is evidence against —
  P⁻(x,x') = Π over x-statements (1 - fun(p)·Π(1 - eq(y,y'))).
- P(x,x') = P⁺ · P⁻, iterated (object equalities may themselves be
  instance equalities from the previous round).

Spark shape: each iteration is two join+aggregate passes in LOG space
(products become SUM(log), exp at the end), evaluated only on candidate
pairs (instances connected through at least one positively-equal object on
a prior-carrying property) — never the instance cross product. Pairs whose
objects never match simply don't appear (their unmatched factors are 1).
Literal equalities come either from exact value identity (the SQL-checkable
mode) or from the soft-TF-IDF scorer used by AgentMatch.

Default priors are the reference's measured values: schema:name
invFun 0.9700722394220846 / fun 0.8043465064044194, email invFun 0.99 /
fun 0.8731440162271805 (ParisEnricher.scala:50-55).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rdf import vocab
from ..rdf.store import Diff, StatementStore

OUTPUT_GRAPH = "urn:graph:parisEnricher"

DEFAULT_PRIORS: dict[str, tuple[float, float]] = {
    # prop -> (inverse_functionality, functionality)
    vocab.NAME: (0.9700722394220846, 0.8043465064044194),
    vocab.EMAIL: (0.99, 0.8731440162271805),
}

# statements schema: (x, p, y) — y is an object identifier (literal id or
# instance iri). literal_eq schema: (y1, y2, eq) with eq in (0, 1].


def _priors_cols(priors: dict[str, tuple[float, float]]):
    invfun = F.create_map(
        *[F.lit(v) for p, (i, _) in priors.items() for v in (p, float(i))]
    )
    fun = F.create_map(
        *[F.lit(v) for p, (_, f) in priors.items() for v in (p, float(f))]
    )
    return invfun, fun


def exact_literal_eq(stmts: DataFrame) -> DataFrame:
    """Literal equality from exact object identity: every distinct object id
    is equal to itself with probability 1. With literal ids minted per
    (value) — not per occurrence — this makes eq(y,y') = 1 iff values are
    identical, the SQL-expressible mode."""
    ids = stmts.select(F.col("y").alias("y1")).dropDuplicates()
    return ids.select("y1", F.col("y1").alias("y2"), F.lit(1.0).alias("eq"))


def paris_step(
    stmts: DataFrame,
    object_eq: DataFrame,
    priors: dict[str, tuple[float, float]] = DEFAULT_PRIORS,
) -> DataFrame:
    """One PARIS iteration → (x, xp, prob) over candidate pairs.

    ``object_eq`` must contain every positively-equal object pair
    (including reflexive rows if exact identity counts as equality).
    """
    invfun_map, fun_map = _priors_cols(priors)
    s = stmts.filter(F.col("p").isin(*priors.keys()))
    s1 = s.select(F.col("x"), F.col("p"), F.col("y"))

    # matched object pairs across instances on the same property
    matched = (
        s1.alias("a")
        .join(object_eq, F.col("a.y") == F.col("y1"))
        .join(
            s1.alias("b"),
            (F.col("y2") == F.col("b.y")) & (F.col("a.p") == F.col("b.p")),
        )
        .filter(F.col("a.x") != F.col("b.x"))
        .select(
            F.col("a.x").alias("x"),
            F.col("b.x").alias("xp"),
            F.col("a.p").alias("p"),
            F.col("a.y").alias("y"),
            F.col("b.y").alias("yp"),
            F.col("eq"),
        )
    )

    # positive evidence: Σ log(1 - invFun·eq) over all matched pairs
    pos = (
        # clamp so a (prior=1, eq=1) pair stays finite (log1p(-1) is NULL)
        matched.withColumn(
            "lg",
            F.log1p(-F.least(invfun_map[F.col("p")] * F.col("eq"), F.lit(1.0 - 1e-15))),
        )
        .groupBy("x", "xp")
        .agg(F.sum("lg").alias("pos_log"))
    )

    # negative evidence: per x-statement, inner = Π(1-eq) over x'-objects of
    # the same property; factor = 1 - fun·inner; unmatched statements keep
    # inner = 1. Needs candidate × x-statements, bounded by candidate count.
    cands = pos.select("x", "xp")
    # eq = 1 makes the inner product exactly 0; Spark's log1p(-1) is NULL
    # (not -inf), so exact matches are tracked with a flag instead
    inner = (
        matched.groupBy("x", "xp", "p", "y")
        .agg(
            F.max((F.col("eq") >= 1.0).cast("int")).alias("exact"),
            F.sum(
                F.when(F.col("eq") < 1.0, F.log1p(-F.col("eq"))).otherwise(F.lit(0.0))
            ).alias("inner_log"),
        )
        .withColumn(
            "inner",
            F.when(F.col("exact") == 1, F.lit(0.0)).otherwise(F.exp("inner_log")),
        )
    )
    neg = (
        cands.join(s1, "x")
        .join(inner.select("x", "xp", "p", "y", "inner"), ["x", "xp", "p", "y"], "left")
        .withColumn(
            # fun = 1.0 with inner = 1 makes the argument exactly 0, and
            # Spark log(0) is NULL, which SUM would silently skip — dropping
            # the zero factor that must drive the pair probability to 0.
            # Clamp like the positive-evidence side.
            "factor",
            F.log(
                F.greatest(
                    1.0 - fun_map[F.col("p")] * F.coalesce("inner", F.lit(1.0)),
                    F.lit(1e-15),
                )
            ),
        )
        .groupBy("x", "xp")
        .agg(F.sum("factor").alias("neg_log"))
    )

    return pos.join(neg, ["x", "xp"]).select(
        "x",
        "xp",
        ((1.0 - F.exp("pos_log")) * F.exp("neg_log")).alias("prob"),
    )


def paris_run(
    stmts: DataFrame,
    literal_eq: DataFrame,
    priors: dict[str, tuple[float, float]] = DEFAULT_PRIORS,
    iterations: int = 10,
) -> DataFrame:
    """Iterate paris_step, feeding instance equalities back as object
    equalities (for statements whose objects are instances). Converges in
    one round when all objects are literals — the loop exits early when a
    round's probabilities stop changing (>1e-9)."""
    instance_eq = None
    result = None
    for _ in range(iterations):
        object_eq = literal_eq
        if instance_eq is not None:
            object_eq = literal_eq.unionByName(
                instance_eq.select(
                    F.col("x").alias("y1"), F.col("xp").alias("y2"), F.col("prob").alias("eq")
                ).filter(F.col("eq") > 0)
            )
        new = paris_step(stmts, object_eq, priors).localCheckpoint(eager=True)
        if result is not None:
            delta = (
                new.alias("n")
                .join(result.alias("o"), ["x", "xp"], "full")
                .select(
                    F.max(
                        F.abs(
                            F.coalesce(F.col("n.prob"), F.lit(0.0))
                            - F.coalesce(F.col("o.prob"), F.lit(0.0))
                        )
                    ).alias("d")
                )
                .first()["d"]
            )
            if delta is not None and delta < 1e-9:
                return new
        result, instance_eq = new, new
    return result


def paris_agent_statements(store: StatementStore) -> DataFrame:
    """Agent name/email statements as (x, p, y) with per-VALUE literal ids
    (agentNamesQuery / agentEmailAddressesQuery: ?agent schema:name ?name;
    ?agent schema:email/schema:name ?emailAddress)."""
    agents = store.quads.filter(
        (F.col("predicate") == vocab.RDF_TYPE) & (F.col("object_value") == vocab.AGENT)
    ).select(F.col("subject").alias("x"))
    names = (
        store.quads.filter(F.col("predicate") == vocab.NAME)
        .join(agents, agents["x"] == F.col("subject"), "left_semi")
        .select(
            F.col("subject").alias("x"),
            F.lit(vocab.NAME).alias("p"),
            F.concat(F.lit("name:"), F.col("object_value")).alias("y"),
        )
    )
    email_nodes = store.quads.filter(F.col("predicate") == vocab.EMAIL).select(
        F.col("subject").alias("x"), F.col("object_value").alias("mailto")
    )
    addr = store.quads.filter(F.col("predicate") == vocab.NAME).select(
        F.col("subject").alias("mailto"), F.col("object_value").alias("address")
    )
    emails = (
        email_nodes.join(agents, "x", "left_semi")
        .join(addr, "mailto")
        .select(
            "x",
            F.lit(vocab.EMAIL).alias("p"),
            F.concat(F.lit("email:"), F.col("address")).alias("y"),
        )
    )
    return names.unionByName(emails).dropDuplicates()


def paris_enricher(
    store: StatementStore,
    diff: Diff,
    persistence_threshold: float = 0.9,
    iterations: int = 10,
) -> Diff:
    """Enricher adapter: exact-literal PARIS over agents → symmetric
    personal:sameAs quads above the persistence threshold, differentFrom
    suppressed (ParisEnricher.scala:173-180)."""
    stmts = paris_agent_statements(store)
    pairs = paris_run(stmts, exact_literal_eq(stmts), iterations=iterations)
    pairs = pairs.filter(F.col("prob") >= persistence_threshold)
    different = store.quads.filter(F.col("predicate") == vocab.DIFFERENT_FROM).select(
        F.col("subject").alias("x"), F.col("object_value").alias("xp")
    )
    sym = different.unionByName(different.select(F.col("xp").alias("x"), F.col("x").alias("xp")))
    pairs = pairs.join(sym, ["x", "xp"], "left_anti")
    added = (
        pairs.select(
            F.col("x").alias("subject"),
            F.lit(vocab.SAME_AS).alias("predicate"),
            F.col("xp").alias("object_value"),
        )
        .withColumn("object_type", F.lit("iri"))
        .withColumn("object_datatype", F.lit(None).cast("string"))
        .withColumn("object_lang", F.lit(None).cast("string"))
        .withColumn("graph", F.lit(OUTPUT_GRAPH))
        .dropDuplicates()
    )
    return Diff(added=added, removed=added.limit(0))
