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
    they are NULL for IRIs / plain literals (and whenever only one side
    bound the variable in object position), and ``NULL = NULL`` is false
    in a Spark equi-join — joining on them silently empties the result
    for any variable shared between two object positions. Instead the
    hidden columns are reconciled via null-safe equality in the join
    condition (same binding ⇒ same term kind) and the duplicates are
    coalesced into one column after the join.
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
    for h in hidden:
        # Same variable bound to the same value in two object positions
        # must also agree on term kind; `<=>` treats NULL (plain
        # literal / IRI) as a definite, comparable state. Putting this
        # in the join condition (not a post-filter) keeps OPTIONAL
        # semantics: a kind mismatch is a non-match, not a dropped row.
        cond = cond & F.col(h).eqNullSafe(F.col(h + "__r"))
    joined = left.join(right2, on=cond, how=how)
    for c in base:
        joined = joined.drop(c + "__r")
    for h in hidden:
        joined = joined.withColumn(h, F.coalesce(F.col(h), F.col(h + "__r"))).drop(h + "__r")
    return joined


class BGP:
    def __init__(self, quads: DataFrame, track_types: bool = False):
        """``track_types``: carry hidden ``<var>__type/__datatype/__lang``
        columns for variables bound in OBJECT position, so CONSTRUCT can
        re-emit solutions as quads without guessing term kinds. Hidden
        columns are NEVER equi-join keys (they are NULL for IRIs / plain
        literals and NULL = NULL is false) — ``join_on_shared`` joins on
        base variable names and reconciles term kinds null-safely."""
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
