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

Pattern = tuple  # (s, p, o) or (s, p, o, g); each term str constant or V


class BGP:
    def __init__(self, quads: DataFrame, track_types: bool = False):
        """``track_types``: carry hidden ``<var>__type/__datatype/__lang``
        columns for variables bound in OBJECT position, so CONSTRUCT can
        re-emit solutions as quads without guessing term kinds. Shared-
        variable joins include the hidden columns (same binding → same quad
        value → same type), so join semantics are unchanged."""
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
            p_df = self._pattern_df(pattern)
            shared = sorted(set(result.columns) & set(p_df.columns))
            result = result.join(p_df, on=shared) if shared else result.crossJoin(p_df)
        return result

    def optional(self, base: DataFrame, patterns: Sequence[Pattern]) -> DataFrame:
        """OPTIONAL { patterns }: left outer join on shared variables."""
        opt = self.compile(patterns)
        shared = sorted(set(base.columns) & set(opt.columns))
        if not shared:
            raise ValueError("OPTIONAL block shares no variables with base")
        return base.join(opt, on=shared, how="left")

    @staticmethod
    def union(a: DataFrame, b: DataFrame) -> DataFrame:
        """UNION: align columns by name, null-filling missing bindings."""
        return a.unionByName(b, allowMissingColumns=True)

    @staticmethod
    def filter(df: DataFrame, condition: Column) -> DataFrame:
        return df.filter(condition)
