"""BGP (basic graph pattern) compiler: triple/quad patterns → DataFrame joins.

The declared SPARQL-relational surface of the reference (SURVEY.md §2.3):
BGP, GRAPH scoping, OPTIONAL, UNION, FILTER, aggregation/ORDER BY are all
expressible by compiling each pattern to a filtered projection of the quads
table and joining patterns on shared variables — one join per pattern edge,
exactly the shape RDF4J evaluates, but planned by Catalyst (join reordering,
broadcast selection, AQE all apply).

Example (agent→email 2-hop, reference AgentMatchEnricher.scala:95-100):

    bgp = BGP(quads)
    df = bgp.compile([
        (V("agent"), "schema:email", V("email")),
        (V("email"), "schema:name", V("name")),
    ])
    # df has columns agent, email, name
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..rdf.model import V

# pattern position → quads column
_POSITIONS = ("subject", "predicate", "object_value", "graph")

# suffixes of the hidden term-kind columns emitted under track_types —
# the single authority; plans.sparql and api.service import it
HIDDEN_SUFFIXES = ("__type", "__datatype", "__lang")
_HIDDEN_SUFFIXES = HIDDEN_SUFFIXES

Pattern = tuple  # (s, p, o) or (s, p, o, g); each term str constant or V


def join_on_shared(left: DataFrame, right: DataFrame, how: str = "inner") -> DataFrame:
    """Join two solution relations on their shared BASE variable names.

    Hidden ``__type/__datatype/__lang`` columns must never be join keys:
    ``__datatype``/``__lang`` are NULL for IRIs / plain literals, and
    ``NULL = NULL`` is false in a Spark equi-join — joining on them
    silently empties the result for any variable shared between two
    object positions. Instead the hidden columns are reconciled inside
    the join condition and the duplicates are coalesced afterwards.

    A NULL ``__type`` means the term kind is UNKNOWN for that row (the
    column was null-filled by a UNION over a branch that doesn't carry
    it — e.g. a property-path closure output — or the variable is
    unbound in that solution). Unknown kind must not veto a base-value
    match, so the kind check is gated: it only applies when BOTH sides
    know the kind, and then requires the full (type, datatype, lang)
    trio to agree null-safely.
    """
    shared = set(left.columns) & set(right.columns)
    base = sorted(c for c in shared if not c.endswith(_HIDDEN_SUFFIXES))
    hidden = sorted(c for c in shared if c.endswith(_HIDDEN_SUFFIXES))
    if not base:
        if how != "inner":
            raise ValueError("OPTIONAL block shares no variables with base")
        return left.crossJoin(right)
    if not hidden:
        return left.join(right, on=base, how=how)
    # Rename every shared right-side column so the join condition can be
    # expressed by name, then fold the duplicates back after the join.
    right2 = right
    for c in base + hidden:
        right2 = right2.withColumnRenamed(c, c + "__r")
    cond = F.lit(True)
    for c in base:
        cond = cond & (F.col(c) == F.col(c + "__r"))
    by_var: dict[str, list[str]] = {}
    for h in hidden:
        for sfx in _HIDDEN_SUFFIXES:
            if h.endswith(sfx):
                by_var.setdefault(h[: -len(sfx)], []).append(h)
                break
    for var, cols in by_var.items():
        t = f"{var}__type"
        agree = F.lit(True)
        for h in cols:
            agree = agree & F.col(h).eqNullSafe(F.col(h + "__r"))
        if t in cols:
            # kind check applies only when both sides know the kind;
            # keeping it in the join condition (not a post-filter)
            # preserves OPTIONAL semantics: a kind mismatch is a
            # non-match, not a dropped row.
            cond = cond & (F.col(t).isNull() | F.col(t + "__r").isNull() | agree)
        else:
            cond = cond & agree
    joined = left.join(right2, on=cond, how=how)
    for c in base:
        joined = joined.drop(c + "__r")
    for h in hidden:
        joined = joined.withColumn(h, F.coalesce(F.col(h), F.col(h + "__r"))).drop(h + "__r")
    return joined


class BGP:
    def __init__(self, quads: DataFrame, track_types: bool = False):
        """``track_types``: carry hidden ``<var>__type/__datatype/__lang``
        columns for every bound variable (object position reads them off
        the quad row; subject/predicate/graph positions emit iri/bnode),
        so CONSTRUCT can re-emit solutions as quads without guessing term
        kinds. Hidden columns are NEVER equi-join keys (``__datatype`` /
        ``__lang`` are NULL for IRIs / plain literals and NULL = NULL is
        false) — ``join_on_shared`` joins on base variable names and
        reconciles term kinds inside the join condition."""
        self.quads = quads
        self.track_types = track_types

    def _pattern_df(self, pattern: Pattern) -> DataFrame:
        if len(pattern) not in (3, 4):
            raise ValueError(f"pattern must have 3 or 4 terms: {pattern!r}")
        df = self.quads
        bindings: dict[str, str] = {}  # var name -> quads column
        for col, term in zip(_POSITIONS, pattern):
            if isinstance(term, V):
                if term.name in bindings:  # same var twice in one pattern
                    df = df.filter(F.col(bindings[term.name]) == F.col(col))
                else:
                    bindings[term.name] = col
            elif term is not None:
                df = df.filter(F.col(col) == term)
        out = [F.col(col).alias(name) for name, col in bindings.items()]
        if self.track_types:
            for name, col in bindings.items():
                if col == "object_value":
                    out += [
                        F.col("object_type").alias(f"{name}__type"),
                        F.col("object_datatype").alias(f"{name}__datatype"),
                        F.col("object_lang").alias(f"{name}__lang"),
                    ]
                else:
                    # subject/predicate/graph positions hold IRIs (or
                    # bnode labels in subject position); emitting the
                    # kind here keeps UNION branches that bind a shared
                    # variable in different positions comparable instead
                    # of null-filling __type and failing the kind check
                    kind = (
                        F.when(F.col(col).startswith("_:"), F.lit("bnode"))
                        .otherwise(F.lit("iri"))
                        if col == "subject"
                        else F.lit("iri")
                    )
                    out += [
                        kind.alias(f"{name}__type"),
                        F.lit(None).cast("string").alias(f"{name}__datatype"),
                        F.lit(None).cast("string").alias(f"{name}__lang"),
                    ]
        return df.select(*out)

    def compile(self, patterns: Sequence[Pattern]) -> DataFrame:
        """Inner-join all patterns on their shared variables."""
        if not patterns:
            raise ValueError("empty BGP")
        result = self._pattern_df(patterns[0])
        for pattern in patterns[1:]:
            result = join_on_shared(result, self._pattern_df(pattern))
        return result

    def optional(self, base: DataFrame, patterns: Sequence[Pattern]) -> DataFrame:
        """OPTIONAL { patterns }: left outer join on shared variables."""
        return join_on_shared(base, self.compile(patterns), how="left")

    @staticmethod
    def union(a: DataFrame, b: DataFrame) -> DataFrame:
        """UNION: align columns by name, null-filling missing bindings."""
        return a.unionByName(b, allowMissingColumns=True)

    @staticmethod
    def filter(df: DataFrame, condition: Column) -> DataFrame:
        return df.filter(condition)
