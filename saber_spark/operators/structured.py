"""Structured-data (schema.org JSON-LD) extraction from web pages.

The web-native complement to the text-side KG stages: real Common-Crawl
pages carry machine-readable triples in ``<script type="application/ld+
json">`` blocks, and a KG-construction pipeline harvests those *before*
running any tagger (they are free, exact, and publisher-asserted). The
reference has no markup-triple path at all (its only markup handling is
the PubMed XML title/abstract pull, saber/utils/app_utils.py:63-80) — this
operator is the web-scale generalization the north-star table shape
(url, warc_ts, html, text, lang) calls for.

Scale shape: one narrow regexp over the decoded html (no shuffle), one
``from_json`` projection (JVM Jackson parse, whole-stage codegen — NO
Python), then an ``inline`` of the per-field triple structs. At 100 TB
this is scan-bound: filters on ``lang`` and the script-tag presence push
into the parquet/Iceberg scan, and pages without a block are dropped
before the JSON parse ever runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Non-greedy DOTALL body match: page text may contain newlines; the block
# never contains a nested </script>.
_LDJSON_RE = r'(?s)<script type="application/ld\+json">(.*?)</script>'

# Parsed with a typed schema (not get_json_object) so wordCount lands as
# BIGINT without a per-field JSON re-walk; backticks because @type is not
# an identifier.
_LDJSON_SCHEMA = "`@type` STRING, headline STRING, inLanguage STRING, wordCount BIGINT"


def jsonld_triples(pages: DataFrame, html_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """pages(url, html:binary, ...) -> (url, pred, obj) JSON-LD triples.

    Emits one row per (page, known schema.org property): rdf:type,
    schema:headline, schema:inLanguage, schema:wordCount (stringified so
    the triple table stays a uniform string column, matching the text-side
    triple tables). Pages without an ld+json block produce no rows.
    """
    block = F.regexp_extract(F.decode(F.col(html_col), "utf-8"),
                             _LDJSON_RE, 1)
    parsed = (pages
              .select(F.col(url_col).alias("url"), block.alias("block"))
              .filter(F.col("block") != "")
              .select("url", F.from_json("block", _LDJSON_SCHEMA).alias("j")))
    triples = F.array(
        F.struct(F.lit("rdf:type").alias("pred"),
                 F.col("j.`@type`").alias("obj")),
        F.struct(F.lit("schema:headline").alias("pred"),
                 F.col("j.headline").alias("obj")),
        F.struct(F.lit("schema:inLanguage").alias("pred"),
                 F.col("j.inLanguage").alias("obj")),
        F.struct(F.lit("schema:wordCount").alias("pred"),
                 F.col("j.wordCount").cast("string").alias("obj")),
    )
    return (parsed.select("url", F.inline(triples))
            .filter(F.col("obj").isNotNull()))


# DOTALL non-greedy markup scans (cell text may span lines); RE2-compatible
# so the DuckDB oracle runs the same patterns.
_TABLE_RE = "(?s)<table>(.*?)</table>"
_TR_RE = "(?s)<tr>(.*?)</tr>"
_TD_RE = "(?s)<td>(.*?)</td>"


def html_tables(pages: DataFrame, html_col: str = "html",
                url_col: str = "url") -> DataFrame:
    """pages(url, html) -> one row per table cell:
    (url, table_idx, row_idx, col_idx, cell) — all indices 0-based.

    The OTHER machine-readable triple source on real web pages besides
    JSON-LD: relational facts published as markup tables (WebTables /
    DBpedia-from-Wikipedia lineage — a large share of web-harvested KG
    facts originate as table cells keyed by header row + entity column).
    This stage turns the markup into a relational (page, table, row, col,
    value) tuple table the downstream triple assembler can pivot.

    Scale shape: three nested regexp_extract_all + posexplode passes, all
    narrow (zero shuffle, zero Python, codegen regexp) — output cardinality
    is the total cell count, reached without ever shuffling the html. The
    regexes are deliberately strict (bare <table>/<tr>/<td> as produced by
    the fixture/normalizer); attribute-carrying markup is normalized
    upstream by the extraction kernel family.
    """
    html = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        html = F.decode(html, "utf-8")
    return (pages
            .select(F.col(url_col).alias("url"),
                    F.posexplode(F.regexp_extract_all(html, F.lit(_TABLE_RE),
                                                      F.lit(1)))
                    .alias("table_idx", "tbl"))
            .select("url", "table_idx",
                    F.posexplode(F.regexp_extract_all("tbl", F.lit(_TR_RE),
                                                      F.lit(1)))
                    .alias("row_idx", "row"))
            .select("url", "table_idx", "row_idx",
                    F.posexplode(F.regexp_extract_all("row", F.lit(_TD_RE),
                                                      F.lit(1)))
                    .alias("col_idx", "cell"))
            .select("url",
                    F.col("table_idx").cast("long").alias("table_idx"),
                    F.col("row_idx").cast("long").alias("row_idx"),
                    F.col("col_idx").cast("long").alias("col_idx"),
                    "cell"))


def table_triples(cells: DataFrame) -> DataFrame:
    """html_tables output -> (url, subj, pred, obj) entity-attribute
    triples, reading each table as header row + entity rows.

    The WebTables relation-recovery convention (Cafarella et al. VLDB'08):
    row 0 is the attribute header, column 0 of each later row names the
    entity, and every other cell asserts (entity, header_j, cell_ij) —
    how DBpedia-style fact extraction reads an infobox-like table. Tables
    without at least one data row and two columns contribute nothing.

    Scale shape: two equi-joins keyed (url, table_idx, col_idx) /
    (url, table_idx, row_idx) against the header and entity-column
    slices — both slices are narrow filters of the same cell table and
    AQE-broadcastable per shard (headers are one row per table). No
    window, no Python, no all-pairs.
    """
    headers = (cells.filter((F.col("row_idx") == 0) & (F.col("col_idx") > 0))
               .select("url", "table_idx", "col_idx",
                       F.col("cell").alias("pred")))
    subjects = (cells.filter((F.col("row_idx") > 0) & (F.col("col_idx") == 0))
                .select("url", "table_idx", "row_idx",
                        F.col("cell").alias("subj")))
    values = cells.filter((F.col("row_idx") > 0) & (F.col("col_idx") > 0))
    return (values
            .join(headers, ["url", "table_idx", "col_idx"])
            .join(subjects, ["url", "table_idx", "row_idx"])
            .select("url", "subj", "pred", F.col("cell").alias("obj")))


# Microdata element scans (third structured-data syntax after JSON-LD and
# markup tables — the WebDataCommons triad). DOTALL non-greedy, RE2-safe.
_SCOPE_TYPE_RE = '<div itemscope itemtype="([^"]*)">'
_SCOPE_BODY_RE = '(?s)<div itemscope itemtype="[^"]*">(.*?)</div>'
_PROP_SPAN_RE = '(?s)<span itemprop="[^"]*">.*?</span>'
_PROP_META_RE = '<meta itemprop="[^"]*" content="[^"]*">'
_PROP_NAME_RE = 'itemprop="([^"]*)"'
_SPAN_VALUE_RE = '(?s)>(.*?)</span>'
_META_VALUE_RE = 'content="([^"]*)"'


def _entity_decode(col):
    # inverse of the fixture's escape: specific entities first, &amp;
    # LAST, so "&amp;lt;" round-trips to "&lt;" rather than "<"
    col = F.replace(col, F.lit("&lt;"), F.lit("<"))
    col = F.replace(col, F.lit("&gt;"), F.lit(">"))
    col = F.replace(col, F.lit("&quot;"), F.lit('"'))
    col = F.replace(col, F.lit("&amp;"), F.lit("&"))
    return col


def microdata_triples(pages: DataFrame, html_col: str = "html",
                      url_col: str = "url") -> DataFrame:
    """pages(url, html) -> (url, pred, obj) microdata triples.

    Harvests schema.org microdata (``itemscope``/``itemprop`` attributes
    — the third publisher-asserted triple syntax real Common-Crawl KG
    construction extracts besides JSON-LD blocks and markup tables; the
    WebDataCommons corpus is dominated by exactly these three). Emits
    one ``rdf:type`` row per itemscope (the itemtype's trailing path
    segment, matching jsonld_triples' convention) plus one
    ``schema:<name>`` row per ``<span itemprop>`` element body and per
    ``<meta itemprop content>`` attribute, HTML entities decoded
    (&amp; last — the order that inverts the standard escape).

    Scale shape: narrow regexp scans + posexplode over the decoded html
    (zero shuffle, zero Python, codegen regexp); pages without an
    itemscope are dropped before any element scan runs.
    """
    html = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        html = F.decode(html, "utf-8")
    scoped = (pages
              .select(F.col(url_col).alias("url"),
                      F.regexp_extract(html, _SCOPE_TYPE_RE, 1)
                      .alias("itemtype"),
                      F.regexp_extract(html, _SCOPE_BODY_RE, 1)
                      .alias("body"))
              .filter(F.col("itemtype") != ""))
    type_rows = scoped.select(
        "url", F.lit("rdf:type").alias("pred"),
        F.regexp_extract("itemtype", "([^/]*)$", 1).alias("obj"))

    def prop_rows(elem_re: str, value_re: str) -> DataFrame:
        return (scoped
                .select("url",
                        F.explode(F.regexp_extract_all(
                            "body", F.lit(elem_re), F.lit(0)))
                        .alias("elem"))
                .select("url",
                        F.concat(F.lit("schema:"),
                                 F.regexp_extract("elem", _PROP_NAME_RE, 1))
                        .alias("pred"),
                        _entity_decode(
                            F.regexp_extract("elem", value_re, 1))
                        .alias("obj")))

    return type_rows.unionByName(
        prop_rows(_PROP_SPAN_RE, _SPAN_VALUE_RE)).unionByName(
        prop_rows(_PROP_META_RE, _META_VALUE_RE))


# Reported-speech patterns — intersection of Java-regex (Spark) and RE2
# (DuckDB) syntax so the oracle runs the IDENTICAL pattern: no lookarounds,
# no backreferences. Speaker = capitalized token run ("Dr. Chen").
# Speaker = run of capitalized tokens; the FINAL token is period-free so a
# sentence-closing "." stays outside the capture ("... replied Dean Park.").
_SPEAKER_RE = r'((?:[A-Z][A-Za-z.]* )*[A-Z][A-Za-z]*)'
QUOTE_DIRECT_RE = _SPEAKER_RE + r' said "([^"]+)"'
QUOTE_INVERTED_RE = r'"([^"]+)," (said|replied) ' + _SPEAKER_RE


def quote_attribution(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Quotation extraction with speaker attribution — the reported-speech
    harvesting stage of a web-KG pipeline (who-said-what edges next to the
    co-occurrence and pattern triples; the quote/claim tables of
    Quotebank-style corpora are built exactly this way at CC scale).

    Two syntactic frames, each one JVM regexp_extract_all pass inside
    codegen (no Python, no shuffle; the only exchange is whatever the
    caller does downstream):
      direct    ``Speaker said "quote"``        -> cue fixed 'said'
      inverted  ``"quote," said|replied Speaker`` -> cue captured

    Group arrays are zipped positionally (arrays_zip + explode), so the
    k-th speaker pairs with the k-th quote of the same frame — Java and
    RE2 both scan leftmost-first, which the oracle twin relies on.

    -> (doc_id, speaker, quote, cue, frame), frame in {direct, inverted}.
    """
    t = F.col(text_col)
    direct = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.arrays_zip(
            F.regexp_extract_all(t, F.lit(QUOTE_DIRECT_RE), 1).alias("sp"),
            F.regexp_extract_all(t, F.lit(QUOTE_DIRECT_RE), 2).alias("qt"),
        )).alias("m"))
        .select("doc_id",
                F.col("m.sp").alias("speaker"),
                F.col("m.qt").alias("quote"),
                F.lit("said").alias("cue"),
                F.lit("direct").alias("frame")))
    inverted = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.arrays_zip(
            F.regexp_extract_all(t, F.lit(QUOTE_INVERTED_RE), 1).alias("qt"),
            F.regexp_extract_all(t, F.lit(QUOTE_INVERTED_RE), 2).alias("cu"),
            F.regexp_extract_all(t, F.lit(QUOTE_INVERTED_RE), 3).alias("sp"),
        )).alias("m"))
        .select("doc_id",
                F.col("m.sp").alias("speaker"),
                F.col("m.qt").alias("quote"),
                F.col("m.cu").alias("cue"),
                F.lit("inverted").alias("frame")))
    return direct.unionByName(inverted)


# number + unit, RE2∩Java-portable; unit list fixed so the SI map is total
MEASURE_RE = r"([0-9]+(?:\.[0-9]+)?) (km|kg|ms|mb)"
#: unit -> (SI factor, SI unit) — broadcast-literal normalization table
SI_TABLE = {"km": (1000.0, "m"), "kg": (1000.0, "g"),
            "ms": (0.001, "s"), "mb": (1048576.0, "b")}
CITATION_RE = r"\[([0-9]+(?:,[0-9]+)*)\]"


def measurements(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Quantity extraction + SI normalization — the attribute-value half
    of web-KG harvesting (numeric object literals: "spans 12 km" ->
    (doc, 12.0, km, 12000.0, m)), the measurement analog of the
    microdata/table triple paths. One JVM regexp_extract_all pass per
    group zipped positionally; the unit->SI conversion is a codegen'd
    when-chain over the fixed unit vocabulary (schema-sized, literal —
    no join, no Python). Values parse as doubles; the fixture keeps
    them binary-exact so normalization is engine-identical.

    -> (doc_id, quantity, unit, si_value, si_unit).
    """
    t = F.col(text_col)
    base = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.arrays_zip(
            F.regexp_extract_all(t, F.lit(MEASURE_RE), 1).alias("v"),
            F.regexp_extract_all(t, F.lit(MEASURE_RE), 2).alias("u"),
        )).alias("m"))
        .select("doc_id",
                F.col("m.v").cast("double").alias("quantity"),
                F.col("m.u").alias("unit")))
    factor, si_unit = None, None
    for u, (f_, s_) in SI_TABLE.items():
        cond = F.col("unit") == u
        factor = F.when(cond, F.lit(f_)) if factor is None else \
            F.when(cond, F.lit(f_)).otherwise(factor)
        si_unit = F.when(cond, F.lit(s_)) if si_unit is None else \
            F.when(cond, F.lit(s_)).otherwise(si_unit)
    return base.select(
        "doc_id", "quantity", "unit",
        F.round(F.col("quantity") * factor, 6).alias("si_value"),
        si_unit.alias("si_unit"))


def citation_spans(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Bracketed-citation harvesting ("see [1] and [2,3]") -> one row per
    referenced number with its group index — the reference-resolution
    input of scholarly webtext processing (the (doc, ref) edges feed the
    same co-citation analytics the host graph uses). Two nested explodes
    inside codegen: groups by regexp_extract_all, members by split —
    no Python, no shuffle.

    -> (doc_id, group_idx, ref_num) with group_idx 0-based per doc.
    """
    t = F.col(text_col)
    return (docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.regexp_extract_all(t, F.lit(CITATION_RE), 1)))
        .select(F.col("doc_id"), F.col("pos").alias("group_idx"),
                F.explode(F.split(F.col("col"), ",")).alias("_r"))
        .select("doc_id", "group_idx",
                F.col("_r").cast("long").alias("ref_num")))


# RDFa Lite attribute markup (the FOURTH publisher-asserted triple syntax
# next to JSON-LD blocks, markup tables and microdata — WebDataCommons
# splits its harvested quads across exactly these four extractors).
# Java∩RE2 dialect so the DuckDB oracle runs the identical patterns.
_RDFA_TYPEOF_RE = '<div vocab="[^"]*" typeof="([^"]*)">'
_RDFA_BODY_RE = '(?s)<div vocab="[^"]*" typeof="[^"]*">(.*?)</div>'
_RDFA_SPAN_RE = '(?s)<span property="[^"]*">.*?</span>'
_RDFA_META_RE = '<meta property="[^"]*" content="[^"]*">'
_RDFA_NAME_RE = 'property="([^"]*)"'


def rdfa_triples(pages: DataFrame, html_col: str = "html",
                 url_col: str = "url") -> DataFrame:
    """pages(url, html) -> (url, pred, obj) RDFa Lite triples.

    Harvests ``vocab``/``typeof``/``property`` attribute markup — the
    remaining publisher-asserted syntax after jsonld_triples,
    table_triples and microdata_triples. Emits one ``rdf:type`` row per
    typeof scope plus one ``schema:<name>`` row per ``<span property>``
    element body and per ``<meta property content>`` attribute, HTML
    entities decoded (&amp; last — the order that inverts the standard
    escape). Shares value-regex conventions with microdata_triples; the
    reference has no markup path at all (its only markup handling is the
    PubMed XML pull, saber/utils/app_utils.py:63-80).

    Scale shape: narrow regexp scans + explode over the decoded html
    (zero shuffle, zero Python, codegen regexp); pages without a typeof
    scope are dropped before any element scan runs.
    """
    html = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        html = F.decode(html, "utf-8")
    scoped = (pages
              .select(F.col(url_col).alias("url"),
                      F.regexp_extract(html, _RDFA_TYPEOF_RE, 1)
                      .alias("typeof"),
                      F.regexp_extract(html, _RDFA_BODY_RE, 1)
                      .alias("body"))
              .filter(F.col("typeof") != ""))
    type_rows = scoped.select(
        "url", F.lit("rdf:type").alias("pred"), F.col("typeof").alias("obj"))

    def prop_rows(elem_re: str, value_re: str) -> DataFrame:
        return (scoped
                .select("url",
                        F.explode(F.regexp_extract_all(
                            "body", F.lit(elem_re), F.lit(0)))
                        .alias("elem"))
                .select("url",
                        F.concat(F.lit("schema:"),
                                 F.regexp_extract("elem", _RDFA_NAME_RE, 1))
                        .alias("pred"),
                        _entity_decode(
                            F.regexp_extract("elem", value_re, 1))
                        .alias("obj")))

    return type_rows.unionByName(
        prop_rows(_RDFA_SPAN_RE, _SPAN_VALUE_RE)).unionByName(
        prop_rows(_RDFA_META_RE, _META_VALUE_RE))


OG_META_RE = (r'<meta\s+property="(og:[a-z:_]+)"\s+content="([^"]*)"'
              r'\s*/?>')
OG_META_RE_REV = (r'<meta\s+content="([^"]*)"\s+property="(og:[a-z:_]+)"'
                  r'\s*/?>')


def og_meta(pages: DataFrame, html_col: str = "html",
            url_col: str = "url") -> DataFrame:
    """Open Graph metadata harvest (the Open Graph protocol, ogp.me —
    Facebook 2010; the de-facto page-summary vocabulary next to
    microdata/RDFa/JSON-LD, and often the ONLY structured markup a
    page carries): every <meta property="og:*" content="..."> pair,
    BOTH attribute orders (property-first and content-first appear in
    the wild), entity-decoded like the sibling harvesters.

    Scale shape: two regexp_extract_all passes zipped per row
    (narrow, codegen), one explode — the microdata_triples plan
    shape; no joins, no Python.

    -> (url, og_key, content) rows, one per matched tag.
    """

    def harvest(pat: str, key_group: int, val_group: int) -> DataFrame:
        keys = F.regexp_extract_all(F.col(html_col), F.lit(pat),
                                    F.lit(key_group))
        vals = F.regexp_extract_all(F.col(html_col), F.lit(pat),
                                    F.lit(val_group))
        z = F.zip_with(keys, vals,
                       lambda k, v: F.struct(k.alias("k"), v.alias("v")))
        return (pages.select(F.col(url_col).alias("url"),
                             F.explode(z).alias("s"))
                .select("url", F.col("s.k").alias("og_key"),
                        _entity_decode(F.col("s.v")).alias("content")))

    return (harvest(OG_META_RE, 1, 2)
            .unionByName(harvest(OG_META_RE_REV, 2, 1)))
