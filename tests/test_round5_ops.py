"""Round-5 operators: JSON-LD triples, hashed linear scorer, blocking
metrics, ANF reach sketches, winnowing fingerprints."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_001


# ------------------------------------------------------------- jsonld


def _page(spark, url, text):
    payload = F.to_json(F.struct(
        F.lit("Article").alias("@type"),
        F.substring("t", 1, 40).alias("headline"),
        F.lit("en").alias("inLanguage"),
        F.size(F.split(F.trim("t"), r"\s+")).cast("long").alias("wordCount")))
    return (spark.createDataFrame([(url, text)], "url string, t string")
            .select("url", F.encode(F.concat(
                F.lit('<html><head><script type="application/ld+json">'),
                payload, F.lit('</script></head><body>'), F.col("t"),
                F.lit("</body></html>")), "utf-8").alias("html")))


def test_jsonld_roundtrips_escaped_strings(spark):
    from saber_spark.operators.structured import jsonld_triples
    text = 'He said "hi\\there" & left fast'
    rows = {r.pred: r.obj
            for r in jsonld_triples(_page(spark, "u1", text)).collect()}
    assert rows["rdf:type"] == "Article"
    # JSON escaping of quote + backslash must round-trip exactly
    assert rows["schema:headline"] == text[:40]
    assert rows["schema:wordCount"] == "6"


def test_jsonld_page_without_block_emits_nothing(spark):
    from saber_spark.operators.structured import jsonld_triples
    pages = spark.createDataFrame(
        [("u1",)], "url string").select(
        "url", F.encode(F.lit("<html><body>no ld</body></html>"),
                        "utf-8").alias("html"))
    assert jsonld_triples(pages).count() == 0


def test_jsonld_fixture_blanks_have_no_block(spark):
    from saber_spark.fixtures.pages import build_pages_with_jsonld
    pages = build_pages_with_jsonld(spark, SF_DIR_001)
    html = pages.select(F.decode("html", "utf-8").alias("h"))
    n_blocks = html.filter(F.col("h").contains("ld+json")).count()
    n_nonblank = (spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
                  .filter(F.col("text").isNotNull()
                          & (F.trim("text") != "")).count())
    assert n_blocks == n_nonblank


# ---------------------------------------------------- hashed linear


def _py_hashed_score(text, dim=1024):
    clean = "".join(c for c in (text or "") if " " <= c <= "~")
    score = 0
    for i in range(max(len(clean) - 2, 0)):
        b = (ord(clean[i]) * 961 + ord(clean[i + 1]) * 31
             + ord(clean[i + 2])) % dim
        score += (b * 2654435761 % 1000003) % 17 - 8
    return max(len(clean) - 2, 0), score


@pytest.mark.parametrize("text", [
    "", "ab", "hello world", "Hello, Wörld — naïve café!", None])
def test_hashed_score_matches_python_model(spark, text):
    from saber_spark.operators.classify import hashed_linear_score
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = hashed_linear_score(df).collect()[0]
    n, s = _py_hashed_score(text)
    assert (row.n_grams, row.score) == (n, s)
    assert row.label == ("keep" if s > 0 else "drop")


def test_hashed_score_plan_has_no_python_and_no_shuffle(spark):
    from saber_spark.operators.classify import hashed_linear_score
    docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
    plan = hashed_linear_score(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------- blocking metrics


def test_blocking_metrics_exact_counts(spark):
    from saber_spark.operators.canonicalize import blocking_metrics
    # records: aa, ab, ba, bb -> first-char blocks {a:2, b:2} = 2 cand
    # pairs; last-char blocks {a:2, b:2} = 2 cand pairs
    recs = spark.createDataFrame(
        [("aa",), ("ab",), ("ba",), ("bb",)], "name string")
    true_pairs = spark.createDataFrame(
        [("aa", "ab"), ("aa", "ba")], "a string, b string")
    out = {r.scheme: r for r in blocking_metrics(recs, true_pairs).collect()}
    fc, lc = out["first_char"], out["last_char"]
    assert fc.n_records == 4 and fc.n_cand_pairs == 2
    assert fc.n_true_cand == 1            # (aa,ab) co-blocked, (aa,ba) not
    assert fc.pair_completeness == 0.5
    assert fc.reduction_ratio == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert lc.n_true_cand == 1            # (aa,ba) share last char
    assert lc.n_blocks == 2


# ------------------------------------------------------- anf reach


def _fm_bit(name):
    h = int(hashlib.md5(name.encode()).hexdigest()[:8], 16)
    return min((h & -h).bit_length() - 1, 24) if h else 24


def test_anf_chain_accumulates_sketches(spark):
    from saber_spark.operators.graph import anf_reach
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    out = {r.node: r.sketch for r in anf_reach(edges, rounds=2).collect()}
    # after 2 rounds a has ORed in b (1 hop) and c (2 hops) but NOT d
    assert out["a"] == (1 << _fm_bit("a")) | (1 << _fm_bit("b")) \
        | (1 << _fm_bit("c"))
    # sink keeps only its own bit
    assert out["d"] == 1 << _fm_bit("d")


def test_anf_more_rounds_is_monotone(spark):
    from saber_spark.operators.graph import anf_reach
    docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
    e = docs.select(
        F.concat(F.lit("p"), F.col("doc_id").cast("string")).alias("src"),
        F.concat(F.lit("p"), (F.col("doc_id") % 19).cast("string"))
        .alias("dst")).filter("src <> dst")
    r1 = {r.node: r.sketch for r in anf_reach(e, rounds=1).collect()}
    r2 = {r.node: r.sketch for r in anf_reach(e, rounds=2).collect()}
    for n, s in r1.items():
        assert r2[n] & s == s  # sketches only gain bits


# ------------------------------------------------------ winnowing


def test_winnow_shared_substring_guarantee(spark):
    from saber_spark.operators.dedup import winnow_fingerprints
    # docs share an 8-char substring (k + w - 1 = 8) -> the winnowing
    # guarantee says they must share at least one fingerprint
    common = "xqzvbnmk"
    docs = spark.createDataFrame(
        [(1, "aaaa" + common + "bbbb"), (2, "cccc" + common + "dddd")],
        "doc_id long, text string")
    fps = winnow_fingerprints(docs, digest=False)
    f1 = {r.fp for r in fps.filter("doc_id = 1").collect()}
    f2 = {r.fp for r in fps.filter("doc_id = 2").collect()}
    assert f1 & f2


def test_winnow_digest_shape_and_short_doc_dropped(spark):
    from saber_spark.operators.dedup import winnow_fingerprints
    docs = spark.createDataFrame(
        [(1, "short"), (2, "long enough text here")],
        "doc_id long, text string")
    rows = winnow_fingerprints(docs).collect()
    assert [r.doc_id for r in rows] == [2]
    r = rows[0]
    # n_windows = len - 7; fingerprints are window minima so n_fps <= windows
    assert r.n_windows == len("long enough text here") - 7
    assert 1 <= r.n_fps <= r.n_windows


# ------------------------------------------------------ html tables


def test_html_tables_indices_and_multiline_cells(spark):
    from saber_spark.operators.structured import html_tables
    html = ("<html><table><tr><td>a</td><td>b\nb2</td></tr>"
            "<tr><td>c</td></tr></table>"
            "<table><tr><td>x</td></tr></table></html>")
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    rows = {(r.table_idx, r.row_idx, r.col_idx): r.cell
            for r in html_tables(pages).collect()}
    assert rows == {(0, 0, 0): "a", (0, 0, 1): "b\nb2",
                    (0, 1, 0): "c", (1, 0, 0): "x"}


def test_html_tables_binary_html_and_no_tables(spark):
    from saber_spark.operators.structured import html_tables
    from pyspark.sql import functions as F
    pages = spark.createDataFrame(
        [("u1", "<table><tr><td>v</td></tr></table>"), ("u2", "<p>no</p>")],
        "url string, h string").select(
        "url", F.encode("h", "utf-8").alias("html"))
    out = html_tables(pages).collect()
    assert [(r.url, r.cell) for r in out] == [("u1", "v")]


# ------------------------------------------------ anchor commonness


def test_anchor_commonness_priors_and_argmax(spark):
    from saber_spark.operators.webstats import anchor_commonness
    anchors = spark.createDataFrame(
        [("s", "https://a.org/1", "apple"),
         ("s", "https://a.org/2", "apple"),
         ("s", "https://b.org/1", "apple"),
         ("s", "https://b.org/1", " pear ")],
        "src_url string, dst_url string, anchor string")
    out = {(r.anchor, r.dst_host): r
           for r in anchor_commonness(anchors).collect()}
    a_a = out[("apple", "a.org")]
    assert (a_a.n_refs, a_a.n_anchor_total) == (2, 3)
    assert a_a.prior == pytest.approx(2 / 3, abs=1e-6) and a_a.is_top
    assert not out[("apple", "b.org")].is_top
    assert out[("pear", "b.org")].prior == 1.0  # trimmed


# ------------------------------------------------ host boilerplate


def test_host_boilerplate_threshold_inclusive(spark):
    from saber_spark.operators.webstats import host_boilerplate
    # host h: 4 pages; "foot" on all 4, "半" stripped? no — ASCII only in
    # fixture; "privacy" on exactly 2 (= ceil(0.5*4)) -> boilerplate;
    # "only1" on 1 page -> content
    rows = [(f"https://h.org/{i}",
             "foot" + ("\nprivacy" if i < 2 else "") +
             (f"\nonly{i}" if i == 0 else "")) for i in range(4)]
    pages = spark.createDataFrame(rows, "url string, text string")
    r = host_boilerplate(pages).collect()[0]
    assert (r.host, r.n_pages) == ("h.org", 4)
    assert r.n_distinct_lines == 3 and r.n_boiler_lines == 2
    assert r.boiler_rate == pytest.approx(2 / 3, abs=1e-6)


# ----------------------------------------------------- cocitation


def test_cocitation_and_coupling_counts(spark):
    from saber_spark.operators.graph import cocitation
    # p1 cites a,b ; p2 cites a,b ; p3 cites a  -> cocited(a,b)=2
    # a is cited by p1,p2,p3; b by p1,p2       -> coupled(p1,p2)=2 etc.
    edges = spark.createDataFrame(
        [("p1", "a"), ("p1", "b"), ("p2", "a"), ("p2", "b"), ("p3", "a")],
        "src string, dst string")
    out = {(r.a, r.b): (r.n_cocited, r.n_coupled)
           for r in cocitation(edges).collect()}
    assert out[("a", "b")] == (2, 0)
    assert out[("p1", "p2")] == (0, 2)
    assert out[("p1", "p3")] == (0, 1)
    assert ("p3", "b") not in out and ("b", "p3") not in out


# --------------------------------------------------- table triples


def test_table_triples_header_entity_recovery(spark):
    from saber_spark.operators.structured import html_tables, table_triples
    html = ("<table><tr><td>name</td><td>pop</td><td>lang</td></tr>"
            "<tr><td>oslo</td><td>700k</td><td>no</td></tr>"
            "<tr><td>bern</td><td>140k</td><td>de</td></tr></table>"
            "<table><tr><td>headeronly</td><td>x</td></tr></table>")
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    out = {(r.subj, r.pred): r.obj
           for r in table_triples(html_tables(pages)).collect()}
    assert out == {("oslo", "pop"): "700k", ("oslo", "lang"): "no",
                   ("bern", "pop"): "140k", ("bern", "lang"): "de"}


def test_table_triples_single_column_contributes_nothing(spark):
    from saber_spark.operators.structured import html_tables, table_triples
    html = "<table><tr><td>only</td></tr><tr><td>col</td></tr></table>"
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    assert table_triples(html_tables(pages)).count() == 0


# ------------------------------------------------------------- microdata


class TestMicrodata:
    def _page(self, spark, url, body):
        return (spark.createDataFrame([(url,)], "url string")
                .select("url", F.encode(F.concat(
                    F.lit("<html><body>"), F.lit(body),
                    F.lit("</body></html>")), "utf-8").alias("html")))

    def test_extracts_type_span_and_meta_props(self, spark):
        from saber_spark.operators.structured import microdata_triples
        body = ('<div itemscope itemtype="https://schema.org/Article">'
                '<span itemprop="headline">Big news</span>'
                '<meta itemprop="inLanguage" content="en">'
                "</div>")
        got = {(r.pred, r.obj)
               for r in microdata_triples(
                   self._page(spark, "u1", body)).collect()}
        assert got == {("rdf:type", "Article"),
                       ("schema:headline", "Big news"),
                       ("schema:inLanguage", "en")}

    def test_entity_decode_order(self, spark):
        from saber_spark.operators.structured import microdata_triples
        body = ('<div itemscope itemtype="https://schema.org/Thing">'
                '<span itemprop="a">p&lt;q &amp; &quot;r&quot;</span>'
                '<span itemprop="b">&amp;lt;</span>'   # pre-escaped: -> &lt;
                "</div>")
        got = {r.pred: r.obj
               for r in microdata_triples(
                   self._page(spark, "u1", body)).collect()
               if r.pred != "rdf:type"}
        assert got == {"schema:a": 'p<q & "r"', "schema:b": "&lt;"}

    def test_page_without_itemscope_emits_nothing(self, spark):
        from saber_spark.operators.structured import microdata_triples
        assert microdata_triples(
            self._page(spark, "u1", "<p>plain</p>")).count() == 0

    def test_fixture_escape_extract_identity(self, spark):
        from saber_spark.fixtures.pages import (MICRODATA_PUBLISHER,
                                                build_pages_with_microdata)
        from saber_spark.operators.structured import microdata_triples
        out = microdata_triples(
            build_pages_with_microdata(spark, SF_DIR_001))
        pubs = {r.obj for r in
                out.filter(F.col("pred") == "schema:publisher").collect()}
        assert pubs == {MICRODATA_PUBLISHER}
