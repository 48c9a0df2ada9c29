"""KG interop exports: distributed edge-list text + bounded GraphML.

The node/edge parquet tables are the system of record; these writers feed
external graph tooling:

  * write_edgelist — delimiter-separated text, written DISTRIBUTED
    (``df.write.text``): the scalable path, fine at any edge count.
  * to_graphml — a single GraphML XML document built driver-side with
    ElementTree. GraphML is inherently one file, so BOTH the node and
    edge sets are guarded by explicit bounds (limit-probed, not counted —
    the misuse case is a web-scale table, where a full count() is itself
    the bug) and the export raises rather than silently collecting an
    unbounded graph. At 10^12 edges you export the edge-list, or a
    filtered subgraph, never whole-graph GraphML.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"


def write_edgelist(edges: DataFrame, path: str, src: str = "subj",
                   dst: str = "obj", weight: str | None = "n_occurrences",
                   delimiter: str = "\t") -> None:
    """Write (src<delim>dst[<delim>weight]) lines, one file per partition.

    Malformed rows fail at WRITE time rather than corrupting the file
    (same contract as the CoNLL/word2vec writers): a NULL field would be
    silently dropped by concat_ws (changing the column count of that
    line), and a delimiter inside a node id would shift every following
    column — both raise here instead.
    """
    cols = [F.col(src), F.col(dst)]
    if weight is not None:
        cols.append(F.col(weight).cast("string"))
    null_or_delim = F.lit(False)
    for c in cols:
        null_or_delim = null_or_delim | c.isNull() | \
            c.cast("string").contains(delimiter)
    bad = edges.filter(null_or_delim).limit(1).count()
    if bad:
        raise ValueError(
            "write_edgelist: NULL fields or fields containing the "
            "delimiter cannot render as a valid edge-list line")
    (edges.select(F.concat_ws(delimiter, *cols).alias("value"))
     .write.mode("overwrite").text(path))


def _graphml_type(dtype: T.DataType) -> str:
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType,
                          T.ByteType)):
        return "long"
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "double"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    return "string"


def _bounded_collect(df: DataFrame, what: str, bound: int) -> list:
    """limit-probe collect: never scans past bound+1 rows, so calling this
    on a web-scale table raises after a bounded amount of work instead of
    paying a full count() first."""
    rows = df.limit(bound + 1).collect()
    if len(rows) > bound:
        raise ValueError(
            f"graph has more than {bound} {what}; GraphML is a "
            f"single-document format — export write_edgelist() or filter "
            f"to a subgraph instead")
    return rows


def to_graphml(nodes: DataFrame, edges: DataFrame,
               node_id: str = "canonical_id", src: str = "subj",
               dst: str = "obj", weight: str = "n_occurrences",
               node_attrs: tuple[str, ...] = ("label",),
               max_nodes: int = 100_000,
               max_edges: int = 1_000_000) -> str:
    """Small-graph GraphML export (driver-side; node AND edge bounded).

    The weight key's GraphML attr.type is derived from the column's Spark
    type (long/double/boolean/string); NULL attribute or weight values
    are omitted (no <data> element) rather than serialized as the string
    'None'.
    """
    node_rows = _bounded_collect(nodes.select(node_id, *node_attrs),
                                 "nodes", max_nodes)
    edge_df = edges.select(src, dst, weight)
    edge_rows = _bounded_collect(edge_df, "edges", max_edges)
    weight_type = _graphml_type(edge_df.schema[weight].dataType)

    root = ET.Element("graphml", xmlns=GRAPHML_NS)
    for i, attr in enumerate(node_attrs):
        ET.SubElement(root, "key", id=f"d{i}", **{
            "for": "node", "attr.name": attr, "attr.type": "string"})
    ET.SubElement(root, "key", id="w", **{
        "for": "edge", "attr.name": weight, "attr.type": weight_type})
    graph = ET.SubElement(root, "graph", id="kg", edgedefault="undirected")
    for row in node_rows:
        el = ET.SubElement(graph, "node", id=str(row[node_id]))
        for i, attr in enumerate(node_attrs):
            if row[attr] is not None:
                d = ET.SubElement(el, "data", key=f"d{i}")
                d.text = str(row[attr])
    for row in edge_rows:
        el = ET.SubElement(graph, "edge",
                           source=str(row[src]), target=str(row[dst]))
        if row[weight] is not None:
            d = ET.SubElement(el, "data", key="w")
            d.text = str(row[weight])
    return ET.tostring(root, encoding="unicode")


def write_ntriples(edges: DataFrame, path: str, subj: str = "subj",
                   pred: str = "pred", obj: str = "obj",
                   base_iri: str = "http://example.org/kg/") -> None:
    """Write the triple table as W3C N-Triples lines
    (``<s> <p> <o> .``), DISTRIBUTED (``df.write.text`` — the
    write_edgelist path, fine at any triple count).

    N-Triples is the line-oriented RDF serialization — the one RDF form
    that maps 1:1 onto a distributed text sink, which is why public KG
    dumps (Wikidata, DBpedia) ship in it. Terms become IRIs under
    ``base_iri`` with RFC 3987-unsafe bytes percent-encoded
    (space, <>"{}|^\\` and controls — the N-Triples IRIREF exclusion
    set), pure built-in regexp/URL encoding, zero Python in the row
    path. NULL terms raise at write time (the write_edgelist contract:
    a silently dropped field would corrupt the line format).

    Thin policy wrapper over the canonical serializer
    (sources/ntriples.py::to_ntriples with ``encode_iris=True``); that
    module also parses dumps back (``read_ntriples(decode_iris=True)``
    inverts this writer) and handles string literals with spec ECHAR
    escaping.
    """
    from saber_spark.sources.ntriples import to_ntriples
    try:
        lines = to_ntriples(edges, base=base_iri, subj=subj, pred=pred,
                            obj=obj, encode_iris=True, validate=True)
    except ValueError as exc:
        raise ValueError(
            "write_ntriples: NULL subj/pred/obj cannot render as a "
            "valid N-Triples line") from exc
    lines.write.mode("overwrite").text(path)
