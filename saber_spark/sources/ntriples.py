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

#: structural line regex (Java flavor, used via regexp_extract):
#: groups 1=subj IRI, 2=pred IRI, 3=obj IRI (or empty), 4=obj literal
#: body (or empty). The literal body admits only non-quote/non-backslash
#: characters or complete escape pairs, so an unterminated escape or a
#: bare quote fails the whole line rather than mis-parsing.
NT_LINE_RE = (r'^<([^>]*)> <([^>]*)> '
              r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)") \.$')

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


def _iri(term: Column, base: str) -> Column:
    return F.concat(F.lit("<" + base), term, F.lit(">"))


def to_ntriples(triples: DataFrame, base: str = DEFAULT_BASE,
                subj: str = "subj", pred: str = "pred", obj: str = "obj",
                literal_col: str | None = None,
                validate: bool = True) -> DataFrame:
    """Triple rows -> one-column ``line`` DataFrame of N-Triples lines.

    ``literal_col`` optionally names a boolean column: where true the
    object renders as an escaped string literal, else as an IRI. Terms
    destined for IRI position are validated (NULL or raw IRI-forbidden
    characters raise at serialize time, same fail-at-write contract as
    graph_export.write_edgelist — a bad id must not corrupt the dump);
    literal bodies accept anything non-NULL (escaping handles it).
    """
    is_lit = (F.col(literal_col) if literal_col is not None
              else F.lit(False))
    if validate:
        iri_cols = [F.col(subj), F.col(pred)]
        bad = (F.col(subj).isNull() | F.col(pred).isNull()
               | F.col(obj).isNull()
               | (~is_lit & F.col(obj).rlike(_IRI_FORBIDDEN_RE)))
        for c in iri_cols:
            bad = bad | c.rlike(_IRI_FORBIDDEN_RE)
        if triples.filter(bad).limit(1).count():
            raise ValueError(
                "to_ntriples: NULL terms or raw IRI-forbidden characters "
                "(U+0000..U+0020, <>\"{}|^` or backslash) cannot render "
                "as a valid N-Triples line")
    obj_term = F.when(
        is_lit,
        F.concat(F.lit('"'), _escape_literal(F.col(obj)), F.lit('"'))
    ).otherwise(_iri(F.col(obj), base))
    return triples.select(
        F.concat(_iri(F.col(subj), base), F.lit(" "),
                 _iri(F.col(pred), base), F.lit(" "),
                 obj_term, F.lit(" .")).alias("line"))


def parse_ntriples(lines: DataFrame, base: str | None = DEFAULT_BASE,
                   line_col: str = "line",
                   validate: bool = True) -> DataFrame:
    """N-Triples lines -> (subj, pred, obj, is_literal) rows.

    IRIs are returned with ``base`` stripped when they carry it (so the
    round-trip with to_ntriples is the identity); literals are
    unescaped. With ``validate`` (default) a line that fails the
    structural regex raises; with ``validate=False`` such lines are
    silently dropped (the salvage mode for a third-party dump).
    """
    c = F.col(line_col)
    if validate:
        if lines.filter(~c.rlike(NT_LINE_RE)).limit(1).count():
            raise ValueError(
                "parse_ntriples: input contains lines that are not "
                "valid <s> <p> <o|\"literal\"> . statements")
        ok = lines
    else:
        ok = lines.filter(c.rlike(NT_LINE_RE))

    def strip_base(col: Column) -> Column:
        if base is None:
            return col
        n = len(base)
        return F.when(col.startswith(base),
                      col.substr(F.lit(n + 1), F.length(col))
                      ).otherwise(col)

    obj_iri = F.regexp_extract(c, NT_LINE_RE, 3)
    obj_lit = F.regexp_extract(c, NT_LINE_RE, 4)
    # regexp_extract returns '' for a non-participating group, so the
    # IRI-vs-literal discriminator is the raw line shape (group 3 may be
    # legitimately empty for the relative IRI <>)
    is_literal = c.rlike(r'"((?:[^"\\]|\\.)*)" \.$')
    return ok.select(
        strip_base(F.regexp_extract(c, NT_LINE_RE, 1)).alias("subj"),
        strip_base(F.regexp_extract(c, NT_LINE_RE, 2)).alias("pred"),
        F.when(is_literal, _unescape_literal(obj_lit))
        .otherwise(strip_base(obj_iri)).alias("obj"),
        is_literal.alias("is_literal"))


def write_ntriples(triples: DataFrame, path: str, **kwargs) -> None:
    """Distributed N-Triples dump (one .nt shard per partition)."""
    to_ntriples(triples, **kwargs).write.mode("overwrite").text(path)


def read_ntriples(spark, path: str, base: str | None = DEFAULT_BASE,
                  validate: bool = True) -> DataFrame:
    """Read an N-Triples dump back to (subj, pred, obj, is_literal)."""
    return parse_ntriples(spark.read.text(path).withColumnRenamed(
        "value", "line"), base=base, validate=validate)
