"""Common-Crawl-style page table built deterministically from testdata.

Shape follows the driver input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Rows derive 1:1 from the driver-generated ``documents`` parquet (doc_id,
text, lang): url is a function of doc_id, html wraps the text in a fixed
template with EXTRA whitespace/markup so the extraction stage has real work
to do, and the ``text`` column is nulled for even doc_ids to force the
html-extraction path on half the corpus (the reference accepts raw text OR a
fetched document, saber/saber.py:52-96 + app_utils.py:19-80).

The invariant (BASELINE.md): extract(html) must be byte-identical to
``sterilize(text)`` per url. The wrapper is constructed to guarantee the
kernel recovers exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HTML_PREFIX = ("<html><head><title></title><style>body{margin:0}</style>"
               "<script>var cc=1;</script></head>\n<body>\n  <div class=\"main\">"
               "<p>\n")
HTML_SUFFIX = "\n</p></div>\n<footer>&nbsp;</footer>\n</body></html>"

EPOCH_TS = "2024-01-01 00:00:00"


def wrap_html(text: str) -> str:
    """Wrap raw text in the fixed page template (driver-side mirror)."""
    return HTML_PREFIX + (text or "") + HTML_SUFFIX


def build_pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages DataFrame (url, warc_ts, html, text, lang).

    Pure built-in expressions (concat / encode / timestampadd) — no UDF, so
    at 100 TB this stage is a zero-shuffle narrow map over the scan.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("https://example.org/doc/"), F.col("doc_id").cast("string")
                 ).alias("url"),
        F.timestamp_add("SECOND", F.col("doc_id").cast("int"),
                        F.to_timestamp(F.lit(EPOCH_TS))).alias("warc_ts"),
        F.encode(
            F.concat(F.lit(HTML_PREFIX), F.col("text"), F.lit(HTML_SUFFIX)),
            "utf-8").alias("html"),
        F.when(F.col("doc_id") % 2 == 1, F.col("text")).alias("text"),
        F.col("lang"),
    )


def build_pages_with_jsonld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages whose html carries a schema.org JSON-LD
    block (url, html) — the structured-data variant of the page fixture.

    The ld+json payload is synthesized with ``to_json(struct(...))`` so
    string escaping is real JSON escaping (the extraction query must
    round-trip it exactly): @type Article, headline = first 40 chars of
    the text, inLanguage = lang, wordCount = whitespace token count.
    Pages with NULL/blank text carry no block (the no-structured-data
    case the extractor must drop). Narrow map over the scan — no UDF,
    no shuffle.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.to_json(F.struct(
        F.lit("Article").alias("@type"),
        F.substring("text", 1, 40).alias("headline"),
        F.col("lang").alias("inLanguage"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("wordCount")))
    block = F.when(
        F.col("text").isNotNull() & (F.trim("text") != ""),
        F.concat(F.lit('<script type="application/ld+json">'), payload,
                 F.lit("</script>"))).otherwise(F.lit(""))
    return docs.select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(
            F.concat(F.lit("<html><head>"), block,
                     F.lit("</head>\n<body><p>"), F.coalesce("text", F.lit("")),
                     F.lit("</p></body></html>")),
            "utf-8").alias("html"),
    )


# HTML entity escape/decode pair for microdata values: encode & FIRST,
# decode it LAST — the standard order that keeps escape∘decode = identity
# even for pre-escaped-looking payloads ("&amp;lt;" round-trips to "&lt;",
# never "<").
def _entity_escape(col):
    col = F.replace(col, F.lit("&"), F.lit("&amp;"))
    col = F.replace(col, F.lit("<"), F.lit("&lt;"))
    col = F.replace(col, F.lit(">"), F.lit("&gt;"))
    col = F.replace(col, F.lit('"'), F.lit("&quot;"))
    return col


#: publisher constant carrying every escaped entity — forces the
#: extractor's decode path to do real work on every page
MICRODATA_PUBLISHER = 'p<q & "r"'


def build_pages_with_microdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages whose html carries a schema.org
    MICRODATA block (url, html) — the third structured-data syntax next
    to JSON-LD and markup tables (the WebDataCommons extraction triad).

    Values are HTML-entity-escaped on the way in (& first), so the
    extractor's decode has real work on every page: the publisher
    constant carries all four entities, and any document text containing
    markup characters escapes too. Pages with NULL/blank text carry no
    block (the no-structured-data case). Narrow map over the scan — no
    UDF, no shuffle.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    block = F.when(
        F.col("text").isNotNull() & (F.trim("text") != ""),
        F.concat(
            F.lit('<div itemscope itemtype="https://schema.org/Article">'),
            F.lit('<span itemprop="headline">'),
            _entity_escape(F.substring("text", 1, 40)),
            F.lit("</span>"),
            F.lit('<meta itemprop="inLanguage" content="'),
            _entity_escape(F.coalesce(F.col("lang"), F.lit(""))),
            F.lit('">'),
            F.lit('<span itemprop="wordCount">'),
            wc.cast("string"), F.lit("</span>"),
            F.lit('<meta itemprop="publisher" content="'),
            _entity_escape(F.lit(MICRODATA_PUBLISHER)), F.lit('">'),
            F.lit("</div>"))).otherwise(F.lit(""))
    return docs.select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(
            F.concat(F.lit("<html><head></head>\n<body>"), block,
                     F.lit("<p>"), F.coalesce("text", F.lit("")),
                     F.lit("</p></body></html>")),
            "utf-8").alias("html"),
    )


QUOTE_SPEAKERS = ["Dr. Chen", "Prof. Okafor", "Ms. Ito", "Mr. Alvarez",
                  "Dean Park"]


def build_docs_with_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (doc_id, text) where each non-blank document
    gains two deterministic reported-speech sentences built from its own
    words: a speaker-BEFORE direct quote (``X said "..."``) and a
    speaker-AFTER inverted quote (``"...," replied Y``). Speakers rotate
    through a fixed cast keyed on doc_id, so attribution is re-derivable
    from documents RAW in any engine. Documents whose text is shorter than
    the second slice keep only the direct quote (the inverted pattern
    cannot match an empty body) — the no-second-quote case is real, not
    padded. Narrow map over the scan; no UDF, no shuffle.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cast_arr = F.array(*[F.lit(s) for s in QUOTE_SPEAKERS])
    n = len(QUOTE_SPEAKERS)
    s1 = F.element_at(cast_arr, (F.col("doc_id") % n).cast("int") + 1)
    s2 = F.element_at(cast_arr, ((F.col("doc_id") + 2) % n).cast("int") + 1)
    body = F.trim(F.col("text"))
    speech = F.when(
        F.col("text").isNotNull() & (body != ""),
        F.concat(F.lit(" "), s1, F.lit(' said "'),
                 F.substring(body, 1, 30), F.lit('." "'),
                 F.substring(body, 31, 24), F.lit('," replied '),
                 s2, F.lit("."))).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), speech).alias("text"))


MEASURE_UNITS = ["km", "kg", "ms", "mb"]


def build_docs_with_measurements(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """documents.parquet -> (doc_id, text) where each non-blank document
    gains a deterministic measurement sentence built from its own id:
    two quantities (one integral, one x.5 — exact in binary, so SI
    conversion is bit-identical in any engine) with units rotating
    through MEASURE_UNITS, plus a citation-style reference group
    ("see [n] and [n+1,n+2]"). Feeds quantity extraction + citation
    harvesting; the oracle re-derives the same sentence from documents
    RAW. Narrow map, no UDF, no shuffle.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    units = F.array(*[F.lit(u) for u in MEASURE_UNITS])
    n = len(MEASURE_UNITS)
    u1 = F.element_at(units, (F.col("doc_id") % n).cast("int") + 1)
    u2 = F.element_at(units, ((F.col("doc_id") + 1) % n).cast("int") + 1)
    v1 = (F.col("doc_id") % 97).cast("string")
    v2 = F.concat(((F.col("doc_id") + 3) % 41).cast("string"), F.lit(".5"))
    r1 = (F.col("doc_id") % 8 + 1).cast("string")
    r2 = (F.col("doc_id") % 8 + 2).cast("string")
    r3 = (F.col("doc_id") % 8 + 3).cast("string")
    extra = F.when(
        F.col("text").isNotNull() & (F.trim("text") != ""),
        F.concat(F.lit(" spans "), v1, F.lit(" "), u1,
                 F.lit(" and weighs "), v2, F.lit(" "), u2,
                 F.lit(", see ["), r1, F.lit("] and ["),
                 r2, F.lit(","), r3, F.lit("]."))).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), extra).alias("text"))


def build_pages_with_rdfa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages whose html carries an RDFa Lite block
    (url, html) — the fourth structured-data syntax next to JSON-LD,
    markup tables and microdata (completing the WebDataCommons quartet).

    Same conventions as the microdata fixture: values are
    HTML-entity-escaped on the way in (& first) so the extractor's
    decode has real work on every page — the publisher constant carries
    all four entities — and pages with NULL/blank text carry no block.
    Narrow map over the scan; no UDF, no shuffle.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    block = F.when(
        F.col("text").isNotNull() & (F.trim("text") != ""),
        F.concat(
            F.lit('<div vocab="https://schema.org/" typeof="Article">'),
            F.lit('<span property="headline">'),
            _entity_escape(F.substring("text", 1, 40)),
            F.lit("</span>"),
            F.lit('<meta property="inLanguage" content="'),
            _entity_escape(F.coalesce(F.col("lang"), F.lit(""))),
            F.lit('">'),
            F.lit('<span property="wordCount">'),
            wc.cast("string"), F.lit("</span>"),
            F.lit('<meta property="publisher" content="'),
            _entity_escape(F.lit(MICRODATA_PUBLISHER)), F.lit('">'),
            F.lit("</div>"))).otherwise(F.lit(""))
    return docs.select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(
            F.concat(F.lit("<html><head></head>\n<body>"), block,
                     F.lit("<p>"), F.coalesce("text", F.lit("")),
                     F.lit("</p></body></html>")),
            "utf-8").alias("html"),
    )


#: rotating cast/org/verb wheels for the OpenIE fixture — keyed on doc_id
#: so every field is re-derivable from documents RAW in any engine.
OPENIE_PEOPLE = ["Alice", "Bob", "Carol", "Dave", "Erin", "Frank"]
OPENIE_ORGS = ["Acme", "Globex", "Initech", "Umbrella", "Hooli"]
OPENIE_VERBS = ["founded", "acquired", "owns", "leads", "runs"]


def build_docs_with_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (doc_id, text) where each non-blank document
    gains three deterministic relational sentences built from its own id
    and first word: ``X <verb> Org.``, ``Org is a <w1>.`` and ``X has a
    <w1>.`` with person/org/verb rotating through fixed wheels keyed on
    doc_id — the OpenIE extraction input. The original word-salad body is
    kept in front of the injected clauses, so the extractor's pattern scan
    does real work over full-length pages and must not fire on the
    lowercase body. Narrow map over the scan; no UDF, no shuffle.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def wheel(vals, shift):
        arr = F.array(*[F.lit(v) for v in vals])
        return F.element_at(
            arr, ((F.col("doc_id") + shift) % len(vals)).cast("int") + 1)

    person, org, verb = (wheel(OPENIE_PEOPLE, 0), wheel(OPENIE_ORGS, 1),
                         wheel(OPENIE_VERBS, 2))
    w1 = F.regexp_extract(F.trim("text"), r"^(\S+)", 1)
    clause = F.when(
        F.col("text").isNotNull() & (F.trim("text") != ""),
        F.concat(F.lit(" "), person, F.lit(" "), verb, F.lit(" "), org,
                 F.lit(". "), org, F.lit(" is a "), w1,
                 F.lit(". "), person, F.lit(" has a "), w1, F.lit("."))
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), clause).alias("text"))
