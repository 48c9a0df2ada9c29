"""WARC (Web ARChive, ISO 28500) ingestion — Common Crawl's native format.

The north-star input is an Iceberg table of Common-Crawl-style pages; the
upstream of that table is WARC files. This connector turns raw WARC into
the (url, warc_ts, html/text payload) shape `fixtures/pages.py` models,
entirely with built-in expressions:

  * record splitting happens AT THE SOURCE: `spark.read.text` with
    `lineSep='WARC/1.0\\r\\n'` makes the record boundary the row
    delimiter, so a multi-GB WARC streams through the scan as one row per
    record — no whole-file UDF, no driver-side parsing, and record-level
    parallelism across splits;
  * header-field extraction is narrow regexp in the portable Java∩RE2
    dialect ((?m) multiline anchors, no lookbehind), running in
    whole-stage codegen.

Gzip-member-per-record .warc.gz (the Common Crawl distribution form)
needs a splittable-gzip input format at deploy time; plain .warc files
split natively here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_DELIM = "WARC/1.0\r\n"

# (?m): per-line anchors; header values run to end-of-line (CR excluded)
_H_URI = r"(?m)^WARC-Target-URI:[ \t]*([^\r\n]+)"
_H_DATE = r"(?m)^WARC-Date:[ \t]*([^\r\n]+)"
_H_TYPE = r"(?m)^WARC-Type:[ \t]*([^\r\n]+)"
_HDR_BODY_SEP = "\r\n\r\n"


def _parsed_columns(chunk: Column) -> list[Column]:
    """One WARC record body (everything after the `WARC/1.0\\r\\n` version
    line) -> [rec_type, url, warc_ts, payload] columns.

    The header block ends at the first blank line; the payload is the
    rest, with the inter-record trailing CRLFs stripped. Missing headers
    yield NULL (regexp_extract returns '' on no-match; normalized via
    nullif) — records without a WARC-Date stay ingestable with warc_ts
    NULL rather than erroring."""
    hdr = F.substring_index(chunk, _HDR_BODY_SEP, 1)
    body = F.regexp_replace(
        F.substring(chunk, F.length(hdr) + len(_HDR_BODY_SEP) + 1,
                    F.length(chunk)),
        r"(\r\n)+$", "")
    return [
        F.nullif(F.regexp_extract(hdr, _H_TYPE, 1), F.lit("")).alias(
            "rec_type"),
        F.nullif(F.regexp_extract(hdr, _H_URI, 1), F.lit("")).alias("url"),
        F.to_timestamp(
            F.nullif(F.regexp_extract(hdr, _H_DATE, 1), F.lit("")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        body.alias("payload"),
    ]


def parse_warc_chunks(chunks: DataFrame, chunk_col: str = "value",
                      response_only: bool = True) -> DataFrame:
    """(chunk string) rows -> (rec_type, url, warc_ts, payload).

    ``response_only=True`` keeps response/conversion records (the ones
    carrying page content) and drops warcinfo/request/metadata — the
    standard first filter over a crawl, pushed to the scan."""
    out = chunks.select(*_parsed_columns(F.col(chunk_col)))
    out = out.filter(F.col("url").isNotNull())
    if response_only:
        out = out.filter(F.col("rec_type").isin("response", "conversion"))
    return out


def read_warc(spark: SparkSession, path: str,
              response_only: bool = True) -> DataFrame:
    """WARC file(s) -> (rec_type, url, warc_ts, payload), one row per
    record, split at the source by lineSep — record-level parallelism
    with zero Python in the plan."""
    raw = (spark.read.option("lineSep", RECORD_DELIM).text(path)
           .filter(F.length(F.trim(F.col("value"))) > 0))
    return parse_warc_chunks(raw, "value", response_only=response_only)
