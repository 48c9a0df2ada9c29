"""N-Triples serialize/parse (sources/ntriples.py): golden spec lines,
round-trip identity over every ECHAR, write/read through disk, and the
fail-at-write validation contract."""

import pytest
from pyspark.sql import functions as F

from saber_spark.sources.ntriples import (parse_ntriples, read_ntriples,
                                          to_ntriples, write_ntriples)

B = "http://kg.example/"

NASTY = 'a"b\\c\nd\re\tf'           # every ECHAR in one literal
NASTY_ESCAPED = r'a\"b\\c\nd\re\tf'  # its spec rendering


def _store(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, is_lit boolean")


def test_golden_lines_match_spec(spark):
    df = _store(spark, [
        ("cust:1", "placed", "order:9", False),
        ("cust:1", "label", NASTY, True),
    ])
    lines = sorted(r.line for r in
                   to_ntriples(df, literal_col="is_lit").collect())
    assert lines == [
        f"<{B}cust:1> <{B}label> \"{NASTY_ESCAPED}\" .",
        f"<{B}cust:1> <{B}placed> <{B}order:9> .",
    ]


def test_roundtrip_identity_all_echars(spark):
    rows = [
        ("s1", "p", "o1", False),
        ("s2", "p", NASTY, True),
        ("s3", "q", "", True),                   # empty literal
        ("s4", "q", "\\n", True),                # backslash-then-n, NOT LF
        ("s5", "q", "plain words", True),
        ("http://other.org/x", "p", "o1", False),  # foreign-base IRI
    ]
    df = _store(spark, rows)
    back = parse_ntriples(to_ntriples(df, literal_col="is_lit"))
    got = {(r.subj, r.pred, r.obj, r.is_literal) for r in back.collect()}
    assert got == set(rows)


def test_write_read_disk_roundtrip(spark, tmp_path):
    df = _store(spark, [("a", "p", "b", False), ("a", "p", NASTY, True)])
    path = str(tmp_path / "dump.nt")
    write_ntriples(df, path, literal_col="is_lit")
    back = read_ntriples(spark, path)
    got = {(r.subj, r.pred, r.obj, r.is_literal) for r in back.collect()}
    assert got == {("a", "p", "b", False), ("a", "p", NASTY, True)}


def test_iri_validation_raises(spark):
    for bad in [("a b", "p", "o", False),     # space in subject IRI
                ("a", "p", 'o"x', False),     # quote in object IRI
                ("a", None, "o", False)]:     # NULL term
        df = _store(spark, [bad])
        with pytest.raises(ValueError, match="to_ntriples"):
            to_ntriples(df, literal_col="is_lit").collect()


def test_parse_validation_and_salvage(spark):
    lines = spark.createDataFrame(
        [(f"<{B}a> <{B}p> <{B}b> .",),
         ("not a triple line",),
         (f'<{B}a> <{B}p> "dangling escape\\" .',)],  # \" then " = bad
        "line string")
    with pytest.raises(ValueError, match="parse_ntriples"):
        parse_ntriples(lines).collect()
    ok = parse_ntriples(lines, validate=False).collect()
    assert [(r.subj, r.pred, r.obj, r.is_literal) for r in ok] == [
        ("a", "p", "b", False)]


def test_encode_iris_roundtrip(spark):
    rows = [("alice smith", "works<at>", "acme|corp", False),
            ("a+b", "p", 'say "hi"\n', True)]
    df = _store(spark, rows)
    lines = to_ntriples(df, literal_col="is_lit", encode_iris=True)
    for ln in (r.line for r in lines.collect()):
        head = ln.split('"')[0] if '"' in ln else ln
        assert " <" in head and "|" not in head and "{" not in head
    back = parse_ntriples(lines, decode_iris=True)
    got = {(r.subj, r.pred, r.obj, r.is_literal) for r in back.collect()}
    assert got == set(rows)


def test_parse_keeps_foreign_base(spark):
    lines = spark.createDataFrame(
        [("<http://other.org/x> <http://other.org/p> \"v\" .",)],
        "line string")
    r = parse_ntriples(lines).collect()[0]
    assert (r.subj, r.pred, r.obj, r.is_literal) == (
        "http://other.org/x", "http://other.org/p", "v", True)


def test_bnode_roundtrip_and_rules(spark):
    rows = [("_:b0", "p", "o1", False),       # bnode subject
            ("s1", "p", "_:b1.x-2", False),   # bnode object, full charset
            ("_:b0", "p", "_:b0", False)]     # bnode both ends
    df = _store(spark, rows)
    lines = {r.line for r in to_ntriples(df, literal_col="is_lit").collect()}
    assert f"<{B}s1> <{B}p> _:b1.x-2 ." in lines      # verbatim, no base
    back = parse_ntriples(to_ntriples(df, literal_col="is_lit"))
    got = {(r.subj, r.pred, r.obj, r.is_literal) for r in back.collect()}
    assert got == set(rows)
    # malformed label and bnode-as-predicate both raise
    for bad in [("_:", "p", "o", False), ("_:b 0", "p", "o", False),
                ("s", "_:b0", "o", False)]:
        with pytest.raises(ValueError, match="to_ntriples"):
            to_ntriples(_store(spark, [bad]), literal_col="is_lit").collect()


def test_parse_lang_and_datatype_literals(spark):
    lines = spark.createDataFrame(
        [(f'<{B}s> <{B}p> "bonjour"@fr .',),
         (f'<{B}s> <{B}p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .',),
         (f'<{B}s> <{B}p> "plain" .',),
         (f'<{B}s> <{B}p> <{B}o> .',)],
        "line string")
    # truthy reading: suffix dropped, body kept
    got = {(r.obj, r.is_literal) for r in parse_ntriples(lines).collect()}
    assert got == {("bonjour", True), ("42", True), ("plain", True),
                   ("o", False)}
    # with_meta exposes the suffix
    meta = {(r.obj, r.lang, r.datatype)
            for r in parse_ntriples(lines, with_meta=True).collect()}
    assert meta == {
        ("bonjour", "fr", None),
        ("42", None, "http://www.w3.org/2001/XMLSchema#int"),
        ("plain", None, None), ("o", None, None)}
