"""KG interop exports: distributed edge-list text + bounded GraphML.

The node/edge parquet tables are the system of record; these writers feed
external graph tooling:

  * write_edgelist — delimiter-separated text, written DISTRIBUTED
    (``df.write.text``): the scalable path, fine at any edge count.
  * to_graphml — a single GraphML XML document built driver-side with
    ElementTree. GraphML is inherently one file, so this is guarded by an
    explicit ``max_nodes`` bound and raises rather than silently
    collecting an unbounded graph (at 10^12 edges you export the
    edge-list, or a filtered subgraph, never whole-graph GraphML).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"


def write_edgelist(edges: DataFrame, path: str, src: str = "subj",
                   dst: str = "obj", weight: str | None = "n_occurrences",
                   delimiter: str = "\t") -> None:
    """Write (src<delim>dst[<delim>weight]) lines, one file per partition."""
    cols = [F.col(src), F.col(dst)]
    if weight is not None:
        cols.append(F.col(weight).cast("string"))
    (edges.select(F.concat_ws(delimiter, *cols).alias("value"))
     .write.mode("overwrite").text(path))


def to_graphml(nodes: DataFrame, edges: DataFrame,
               node_id: str = "canonical_id", src: str = "subj",
               dst: str = "obj", weight: str = "n_occurrences",
               node_attrs: tuple[str, ...] = ("label",),
               max_nodes: int = 100_000) -> str:
    """Small-graph GraphML export (driver-side; bounded by max_nodes)."""
    n = nodes.count()
    if n > max_nodes:
        raise ValueError(
            f"graph has {n} nodes > max_nodes={max_nodes}; GraphML is a "
            f"single-document format — export write_edgelist() or filter "
            f"to a subgraph instead")
    root = ET.Element("graphml", xmlns=GRAPHML_NS)
    for i, attr in enumerate(node_attrs):
        ET.SubElement(root, "key", id=f"d{i}", **{
            "for": "node", "attr.name": attr, "attr.type": "string"})
    ET.SubElement(root, "key", id="w", **{
        "for": "edge", "attr.name": weight, "attr.type": "long"})
    graph = ET.SubElement(root, "graph", id="kg", edgedefault="undirected")
    for row in nodes.select(node_id, *node_attrs).collect():
        el = ET.SubElement(graph, "node", id=str(row[node_id]))
        for i, attr in enumerate(node_attrs):
            d = ET.SubElement(el, "data", key=f"d{i}")
            d.text = str(row[attr])
    for row in edges.select(src, dst, weight).collect():
        el = ET.SubElement(graph, "edge",
                           source=str(row[src]), target=str(row[dst]))
        d = ET.SubElement(el, "data", key="w")
        d.text = str(row[weight])
    return ET.tostring(root, encoding="unicode")
