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


def test_parse_keeps_foreign_base(spark):
    lines = spark.createDataFrame(
        [("<http://other.org/x> <http://other.org/p> \"v\" .",)],
        "line string")
    r = parse_ntriples(lines).collect()[0]
    assert (r.subj, r.pred, r.obj, r.is_literal) == (
        "http://other.org/x", "http://other.org/p", "v", True)
