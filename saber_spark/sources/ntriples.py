"""RDF N-Triples interop: serialize a triple DataFrame to W3C N-Triples
lines and parse such lines back — entirely JVM-side string expressions
(``F.replace`` literal rewrites + one structural regex), no Python UDF,
no shuffle: both directions run at scan speed inside whole-stage codegen,
so a 10^12-triple store serializes as a distributed ``df.write.text``.

Spec shape (RDF 1.1 N-Triples, https://www.w3.org/TR/n-triples/):

    <IRI> <IRI> <IRI> .
    <IRI> <IRI> "string literal" .

with exactly the spec's ECHAR escapes inside literals (``\\`` ``\"``
``\n`` ``\r`` ``\t``) and raw forbidden characters rejected inside IRIs.
Escaping uses literal ``F.replace`` chains (never regexp_replace, whose
replacement-string backslash semantics are a classic corruption source);
unescaping is made single-pass-correct by first swapping ``\\\\`` to a
NUL sentinel (NUL cannot appear in a valid line — it is IRI-forbidden
and must be escaped in literals) so the remaining backslashes each start
exactly one escape sequence.

The reference emits JSON annotations only (saber/utils/app_utils.py);
RDF serialization is part of this repo's beyond-reference KG interop
layer next to the GraphML/edge-list writers (graph_export.py). The
serialize→parse pair is oracle-checked as a round-trip identity against
a store containing every ECHAR (see __spark_entry__.q_ntriples_roundtrip)
and golden-tested line-for-line in tests/test_ntriples.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BASE = "http://kg.example/"

#: characters that may not appear raw inside an N-Triples IRIREF
#: (spec: not U+0000..U+0020 and none of <>"{}|^` and backslash)
_IRI_FORBIDDEN_RE = r'[\x00-\x20<>"{}|^`\\]'

#: structural line regex (Java flavor, used via regexp_extract).
#: Subjects and objects admit IRIs and blank-node labels; objects also
#: admit string literals with an optional language tag or ^^<datatype>
#: suffix (the Wikidata/DBpedia dump vocabulary). Groups:
#:   1=subj IRI   2=subj bnode label
#:   3=pred IRI
#:   4=obj IRI    5=obj bnode label
#:   6=obj literal body   7=language tag   8=datatype IRI
#: The literal body admits only non-quote/non-backslash characters or
#: complete escape pairs, so an unterminated escape or a bare quote
#: fails the whole line rather than mis-parsing.
_BNODE = r'_:([A-Za-z0-9][A-Za-z0-9._-]*)'
NT_LINE_RE = (r'^(?:<([^>]*)>|' + _BNODE + r') <([^>]*)> '
              r'(?:<([^>]*)>|' + _BNODE +
              r'|"((?:[^"\\]|\\.)*)"'
              r'(?:@([a-zA-Z][a-zA-Z0-9-]*)|\^\^<([^>]*)>)?) \.$')

_NUL = "\x00"


def _escape_literal(c: Column) -> Column:
    """Spec ECHAR escaping for a literal body (backslash FIRST)."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def _unescape_literal(c: Column) -> Column:
    """Inverse of _escape_literal, single-pass-correct via NUL sentinel."""
    c = F.replace(c, F.lit("\\\\"), F.lit(_NUL))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    c = F.replace(c, F.lit(_NUL), F.lit("\\"))
    return c


_BNODE_OK_RE = r'^_:[A-Za-z0-9][A-Za-z0-9._-]*$'


def _iri(term: Column, base: str, encode: bool) -> Column:
    if encode:
        # url_encode percent-escapes everything non-alphanumeric
        # (form-encoding); '+' means space there, so rewrite to %20 for
        # IRI semantics — covers the whole IRIREF exclusion set
        term = F.regexp_replace(F.url_encode(term), r"\+", "%20")
    return F.concat(F.lit("<" + base), term, F.lit(">"))


def _node(term: Column, base: str, encode: bool) -> Column:
    """IRI-or-blank-node rendering: ``_:``-prefixed terms are blank-node
    labels and pass through verbatim (never base-prefixed, never
    percent-encoded — spec BLANK_NODE_LABEL); everything else is an IRI.
    """
    return F.when(term.startswith("_:"), term
                  ).otherwise(_iri(term, base, encode))


def to_ntriples(triples: DataFrame, base: str = DEFAULT_BASE,
                subj: str = "subj", pred: str = "pred", obj: str = "obj",
                literal_col: str | None = None,
                encode_iris: bool = False,
                validate: bool = True) -> DataFrame:
    """Triple rows -> one-column ``line`` DataFrame of N-Triples lines.

    ``literal_col`` optionally names a boolean column: where true the
    object renders as an escaped string literal, else as an IRI.

    Two IRI policies:
      * ``encode_iris=False`` (default): terms are trusted identifiers;
        a NULL or a raw IRI-forbidden character raises at serialize
        time (the graph_export.write_edgelist fail-at-write contract —
        a bad id must not corrupt the dump).
      * ``encode_iris=True``: arbitrary ids are percent-encoded into
        safe IRIs (the policy of graph_export.write_ntriples, which
        delegates here); only NULLs raise. Parse back with
        ``decode_iris=True`` for the round-trip.

    Literal bodies accept anything non-NULL (escaping handles it).
    """
    is_lit = (F.col(literal_col) if literal_col is not None
              else F.lit(False))
    s, p, o = (F.col(subj).cast("string"), F.col(pred).cast("string"),
               F.col(obj).cast("string"))
    if validate:
        def bad_node(c, may_be_lit=None):
            # a _:-prefixed term must be a well-formed blank-node label;
            # any other term is an IRI (charset-checked unless encoding)
            b = c.startswith("_:") & ~c.rlike(_BNODE_OK_RE)
            if not encode_iris:
                b = b | (~c.startswith("_:")
                         & c.rlike(_IRI_FORBIDDEN_RE))
            if may_be_lit is not None:
                b = ~may_be_lit & b
            return b

        bad_pred = p.startswith("_:")   # predicates are IRIs, never bnodes
        if not encode_iris:
            bad_pred = bad_pred | p.rlike(_IRI_FORBIDDEN_RE)
        bad = (s.isNull() | p.isNull() | o.isNull()
               | bad_node(s) | bad_pred | bad_node(o, is_lit))
        if triples.filter(bad).limit(1).count():
            raise ValueError(
                "to_ntriples: NULL terms, malformed _: blank-node "
                "labels, or raw IRI-forbidden characters (U+0000.."
                "U+0020, <>\"{}|^` or backslash) cannot render as a "
                "valid N-Triples line")
    obj_term = F.when(
        is_lit,
        F.concat(F.lit('"'), _escape_literal(o), F.lit('"'))
    ).otherwise(_node(o, base, encode_iris))
    return triples.select(
        F.concat(_node(s, base, encode_iris), F.lit(" "),
                 _iri(p, base, encode_iris), F.lit(" "),
                 obj_term, F.lit(" .")).alias("line"))


def parse_ntriples(lines: DataFrame, base: str | None = DEFAULT_BASE,
                   line_col: str = "line",
                   decode_iris: bool = False,
                   with_meta: bool = False,
                   validate: bool = True) -> DataFrame:
    """N-Triples lines -> (subj, pred, obj, is_literal) rows.

    Accepts the full public-dump vocabulary: IRI terms, ``_:`` blank
    nodes (kept verbatim, never base-stripped), plain string literals,
    ``"..."@lang`` language-tagged literals, and ``"..."^^<dt>`` typed
    literals. IRIs are returned with ``base`` stripped when they carry
    it (so the round-trip with to_ntriples is the identity); with
    ``decode_iris=True`` they are additionally percent-decoded (the
    inverse of ``to_ntriples(encode_iris=True)``). Literal bodies are
    unescaped; the lang/datatype suffix is dropped from ``obj``
    (Wikidata-"truthy" reading) unless ``with_meta=True`` adds ``lang``
    and ``datatype`` columns (NULL when absent or not a literal).
    With ``validate`` (default) a line that fails the structural regex
    raises; with ``validate=False`` such lines are silently dropped
    (the salvage mode for a third-party dump).
    """
    c = F.col(line_col)
    if validate:
        if lines.filter(~c.rlike(NT_LINE_RE)).limit(1).count():
            raise ValueError(
                "parse_ntriples: input contains lines that are not "
                "valid <s> <p> <o|\"literal\"|_:b> . statements")
        ok = lines
    else:
        ok = lines.filter(c.rlike(NT_LINE_RE))

    def strip_base(col: Column) -> Column:
        if base is not None:
            n = len(base)
            col = F.when(col.startswith(base),
                         col.substr(F.lit(n + 1), F.length(col))
                         ).otherwise(col)
        if decode_iris:
            col = F.url_decode(col)
        return col

    def g(i: int) -> Column:
        return F.regexp_extract(c, NT_LINE_RE, i)

    # regexp_extract returns '' for a non-participating group, and ''
    # is also a legitimate IRI (<>), so term KIND comes from the raw
    # line shape, never from group emptiness
    subj_bnode = c.rlike(r'^_:')
    is_literal = c.rlike(r'"(?:@[a-zA-Z][a-zA-Z0-9-]*|\^\^<[^>]*>)? \.$')
    obj_bnode = ~is_literal & c.rlike(r' _:[^ ]+ \.$')
    subj = F.when(subj_bnode, F.concat(F.lit("_:"), g(2))
                  ).otherwise(strip_base(g(1)))
    obj = (F.when(is_literal, _unescape_literal(g(6)))
           .when(obj_bnode, F.concat(F.lit("_:"), g(5)))
           .otherwise(strip_base(g(4))))
    cols = [subj.alias("subj"), strip_base(g(3)).alias("pred"),
            obj.alias("obj"), is_literal.alias("is_literal")]
    if with_meta:
        lang, dt = g(7), g(8)
        cols += [F.when(is_literal & (lang != ""), lang)
                 .alias("lang"),
                 F.when(is_literal & (dt != ""), dt)
                 .alias("datatype")]
    return ok.select(*cols)


def write_ntriples(triples: DataFrame, path: str, **kwargs) -> None:
    """Distributed N-Triples dump (one .nt shard per partition)."""
    to_ntriples(triples, **kwargs).write.mode("overwrite").text(path)


def read_ntriples(spark, path: str, base: str | None = DEFAULT_BASE,
                  validate: bool = True) -> DataFrame:
    """Read an N-Triples dump back to (subj, pred, obj, is_literal)."""
    return parse_ntriples(spark.read.text(path).withColumnRenamed(
        "value", "line"), base=base, validate=validate)
