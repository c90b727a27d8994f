"""GraphML serialization of node/edge DataFrames.

Parity with reference graph/serialization/GraphML.scala (node/edge elements
with <data> attributes, <key> declarations, directed/undirected graphs) —
re-expressed as a distributed serializer: each node/edge row becomes one XML
line inside Spark, so a 100 TB-scale graph export writes as a partitioned
text dataset; only the small header/footer live on the driver. The
``graphml_string`` convenience collects for the debug/Gephi-export use the
reference serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GML_TYPES = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
}


def _xml_escape(col):
    col = F.regexp_replace(col.cast("string"), "&", "&amp;")
    col = F.regexp_replace(col, "<", "&lt;")
    col = F.regexp_replace(col, ">", "&gt;")
    return F.regexp_replace(col, '"', "&quot;")


def _data_parts(df: DataFrame, attrs: list[str]):
    parts = []
    for a in attrs:
        parts.append(
            F.when(
                F.col(a).isNotNull(),
                F.concat(F.lit(f'<data key="{a}">'), _xml_escape(F.col(a)), F.lit("</data>")),
            ).otherwise(F.lit(""))
        )
    return parts


def graphml_lines(
    nodes: DataFrame,
    edges: DataFrame,
    node_id: str = "id",
    src: str = "src",
    dst: str = "dst",
    graph_id: str = "G",
    directed: bool = False,
) -> DataFrame:
    """(section, line) DataFrame of GraphML text, ordered by ``section``.

    Non-id columns of ``nodes`` / non-endpoint columns of ``edges`` become
    <data> attributes with <key> declarations typed from the Spark dtype."""
    spark = nodes.sparkSession
    node_attrs = [c for c in nodes.columns if c != node_id]
    edge_attrs = [c for c in edges.columns if c not in (src, dst)]

    header = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
    ]
    for owner, df, attrs in (("node", nodes, node_attrs), ("edge", edges, edge_attrs)):
        dtypes = dict(df.dtypes)
        for a in attrs:
            gtype = _GML_TYPES.get(dtypes[a], "string")
            header.append(
                f'<key id="{a}" for="{owner}" attr.name="{a}" attr.type="{gtype}"/>'
            )
    header.append(
        f'<graph id="{graph_id}" edgedefault="{"directed" if directed else "undirected"}">'
    )
    footer = ["</graph>", "</graphml>"]

    # header sections grow with the attribute count — keep node/edge/footer
    # sections far above any possible header length so they never interleave
    header_df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(header)], "section long, line string"
    )
    footer_df = spark.createDataFrame(
        [(3_000_000_000 + i, l) for i, l in enumerate(footer)], "section long, line string"
    )
    node_lines = nodes.select(
        F.lit(1_000_000_000).alias("section"),
        F.concat(
            F.lit('<node id="'),
            _xml_escape(F.col(node_id)),
            F.lit('">'),
            *_data_parts(nodes, node_attrs),
            F.lit("</node>"),
        ).alias("line"),
    )
    edge_lines = edges.select(
        F.lit(2_000_000_000).alias("section"),
        F.concat(
            F.lit('<edge id="'),
            _xml_escape(F.concat(F.col(src), F.lit("--"), F.col(dst))),
            F.lit('" source="'),
            _xml_escape(F.col(src)),
            F.lit('" target="'),
            _xml_escape(F.col(dst)),
            F.lit('">'),
            *_data_parts(edges, edge_attrs),
            F.lit("</edge>"),
        ).alias("line"),
    )
    return header_df.unionByName(node_lines).unionByName(edge_lines).unionByName(footer_df)


def graphml_string(
    nodes: DataFrame,
    edges: DataFrame,
    node_id: str = "id",
    src: str = "src",
    dst: str = "dst",
    graph_id: str = "G",
    directed: bool = False,
) -> str:
    """Collect the full document — for small graphs (debug/Gephi export)."""
    rows = (
        graphml_lines(nodes, edges, node_id, src, dst, graph_id, directed)
        .orderBy("section")
        .collect()
    )
    return "\n".join(r.line for r in rows) + "\n"
