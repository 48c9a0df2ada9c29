"""WARC connector: record splitting at the source (lineSep), portable
header parsing, payload reassembly."""

import pytest

REC1 = ("WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: https://a.org/x\r\n"
        "WARC-Date: 2024-01-01T00:00:05Z\r\n"
        "Content-Type: text/plain\r\n"
        "\r\n"
        "hello warc body\r\n"
        "\r\n")
REC2 = ("WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "\r\n"
        "software: test\r\n"
        "\r\n")
REC3 = ("WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://b.org/y\r\n"
        "\r\n"                       # no WARC-Date
        "line one\r\nline two\r\n"
        "\r\n")


@pytest.fixture()
def warc_file(tmp_path):
    p = tmp_path / "crawl.warc"
    p.write_bytes((REC1 + REC2 + REC3).encode())
    return str(p)


class TestReadWarc:
    def test_splits_and_parses_records(self, spark, warc_file):
        from saber_spark.sources.warc import read_warc
        rows = {r.url: r for r in read_warc(spark, warc_file).collect()}
        assert set(rows) == {"https://a.org/x", "https://b.org/y"}
        a = rows["https://a.org/x"]
        assert a.rec_type == "response"
        assert a.payload == "hello warc body"
        assert a.warc_ts is not None and a.warc_ts.second == 5
        b = rows["https://b.org/y"]
        assert b.rec_type == "conversion"
        assert b.warc_ts is None            # missing date stays ingestable
        assert b.payload == "line one\r\nline two"

    def test_response_only_drops_warcinfo(self, spark, warc_file):
        from saber_spark.sources.warc import read_warc
        all_recs = read_warc(spark, warc_file, response_only=False)
        # warcinfo has no Target-URI -> dropped by the url guard either way
        assert all_recs.count() == 2

    def test_zero_python_plan(self, spark, warc_file):
        import io
        from contextlib import redirect_stdout

        from saber_spark.sources.warc import read_warc
        buf = io.StringIO()
        with redirect_stdout(buf):
            read_warc(spark, warc_file).explain("formatted")
        assert "Python" not in buf.getvalue()

    def test_payload_containing_blank_lines(self, spark, tmp_path):
        from saber_spark.sources.warc import read_warc
        rec = ("WARC/1.0\r\n"
               "WARC-Type: response\r\n"
               "WARC-Target-URI: https://c.org/z\r\n"
               "WARC-Date: 2024-01-01T00:00:00Z\r\n"
               "\r\n"
               "para one\r\n\r\npara two\r\n"
               "\r\n")
        p = tmp_path / "b.warc"
        p.write_bytes(rec.encode())
        row = read_warc(spark, str(p)).collect()[0]
        # only the TRAILING record-separator CRLFs strip; interior blank
        # lines (paragraph breaks) survive in the payload
        assert row.payload == "para one\r\n\r\npara two"


class TestStreamingWarc:
    def test_readstream_ingests_records(self, spark, tmp_path):
        """The WARC parse is stateless narrow ops, so the same parser runs
        unchanged under Structured Streaming: drop files into a directory,
        stream them through parse_warc_chunks, and the micro-batch emits
        the same rows the batch reader produces."""
        from pyspark.sql import functions as F

        from saber_spark.sources.warc import (RECORD_DELIM,
                                              parse_warc_chunks, read_warc)
        d = tmp_path / "in"
        d.mkdir()
        (d / "a.warc").write_bytes((REC1 + REC3).encode())
        raw = (spark.readStream.option("lineSep", RECORD_DELIM)
               .schema("value string").text(str(d))
               .filter(F.length(F.trim(F.col("value"))) > 0))
        out = parse_warc_chunks(raw, "value")
        q = (out.writeStream.format("memory").queryName("warc_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        got = {(r.url, r.rec_type)
               for r in spark.sql("select * from warc_stream").collect()}
        batch = {(r.url, r.rec_type)
                 for r in read_warc(spark, str(d)).collect()}
        assert got == batch == {("https://a.org/x", "response"),
                                ("https://b.org/y", "conversion")}
