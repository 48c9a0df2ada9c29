"""Round-5 continuation batch 2: RDFa harvesting, ReVerb-lite OpenIE,
Good-Turing smoothing, Zipf OLS fit."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_001


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


class TestRdfaTriples:
    def test_extracts_types_spans_and_metas(self, spark):
        from saber_spark.operators.structured import rdfa_triples
        html = ('<html><body>'
                '<div vocab="https://schema.org/" typeof="Article">'
                '<span property="headline">Tom &amp; Jerry</span>'
                '<meta property="inLanguage" content="en">'
                '<span property="wordCount">7</span>'
                '<meta property="publisher" content="p&lt;q &amp; &quot;r&quot;">'
                '</div><p>body</p></body></html>')
        out = rdfa_triples(_pages(spark, [("u1", html)])).collect()
        got = {(r.pred, r.obj) for r in out}
        assert got == {
            ("rdf:type", "Article"),
            ("schema:headline", "Tom & Jerry"),
            ("schema:inLanguage", "en"),
            ("schema:wordCount", "7"),
            ("schema:publisher", 'p<q & "r"'),
        }
        assert all(r.url == "u1" for r in out)

    def test_page_without_scope_drops(self, spark):
        from saber_spark.operators.structured import rdfa_triples
        out = rdfa_triples(_pages(
            spark, [("u1", "<html><body><p>plain</p></body></html>")]))
        assert out.count() == 0

    def test_double_escaped_value_round_trips_once(self, spark):
        # "&amp;lt;" must decode to "&lt;", never "<" (decode order)
        from saber_spark.operators.structured import rdfa_triples
        html = ('<div vocab="v" typeof="T">'
                '<span property="x">&amp;lt;</span></div>')
        out = rdfa_triples(_pages(spark, [("u", html)])).collect()
        assert {r.obj for r in out if r.pred == "schema:x"} == {"&lt;"}

    def test_fixture_round_trip(self, spark):
        # extractor(fixture) recovers the raw document fields exactly
        from saber_spark.fixtures.pages import build_pages_with_rdfa
        from saber_spark.operators.structured import rdfa_triples
        docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
        n_live = docs.filter(
            F.col("text").isNotNull() & (F.trim("text") != "")).count()
        out = rdfa_triples(build_pages_with_rdfa(spark, SF_DIR_001))
        per_pred = {r["pred"]: r["n"] for r in
                    out.groupBy("pred").agg(F.count("*").alias("n"))
                    .collect()}
        assert per_pred["rdf:type"] == n_live
        assert per_pred["schema:headline"] == n_live
        assert per_pred["schema:publisher"] == n_live
        heads = (out.filter(F.col("pred") == "schema:headline")
                 .withColumn("doc_id",
                             F.regexp_extract("url", r"(\d+)$", 1)
                             .cast("long"))
                 .join(docs.select("doc_id",
                                   F.substring("text", 1, 40).alias("want")),
                       "doc_id"))
        assert heads.filter(F.col("obj") != F.col("want")).count() == 0


class TestOpenIE:
    def test_core_frame_and_normalization(self, spark):
        from saber_spark.operators.openie import openie_triples
        docs = spark.createDataFrame(
            [(1, "Alice founded Acme. Acme is a company."),
             (2, "Alice founded Acme. Bob has a plan."),
             (3, "lowercase founded acme never matches.")],
            "doc_id long, text string")
        out = {(r.subj, r.pred, r.obj): (r.freq, r.support)
               for r in openie_triples(docs).collect()}
        assert out[("Alice", "founded", "Acme")] == (2, 2)
        assert out[("Acme", "isA", "company")] == (1, 1)
        assert out[("Bob", "has", "plan")] == (1, 1)
        assert len(out) == 3  # nothing fired on the lowercase body

    def test_article_variants_and_tenses(self, spark):
        from saber_spark.operators.openie import openie_triples
        docs = spark.createDataFrame(
            [(1, "Rome was an empire. Paris is the capital. "
                 "Team had an idea.")],
            "doc_id long, text string")
        got = {(r.subj, r.pred, r.obj)
               for r in openie_triples(docs).collect()}
        assert got == {("Rome", "isA", "empire"),
                       ("Paris", "isA", "capital"),
                       ("Team", "has", "idea")}

    def test_relations_fixture_fires_three_per_live_doc(self, spark):
        from saber_spark.fixtures.pages import build_docs_with_relations
        from saber_spark.operators.openie import openie_triples
        docs = spark.read.parquet(f"{SF_DIR_001}/documents.parquet")
        n_live = docs.filter(
            F.col("text").isNotNull() & (F.trim("text") != "")).count()
        out = openie_triples(build_docs_with_relations(spark, SF_DIR_001))
        assert out.agg(F.sum("freq")).first()[0] == 3 * n_live


class TestGoodTuring:
    def test_hand_computed_histogram(self, spark):
        from saber_spark.operators.lm import good_turing
        # counts: a=3, b=1, c=1, d=2  ->  n_1=2, n_2=1, n_3=1
        toks = spark.createDataFrame(
            [("a",)] * 3 + [("b",), ("c",)] + [("d",)] * 2,
            "token string")
        rows = {r.r: r for r in good_turing(toks).collect()}
        assert {r: rows[r].n_r for r in rows} == {1: 2, 2: 1, 3: 1}
        # r*=1 -> 2*n_2/n_1 = 1.0 ; r*=2 -> 3*n_3/n_2 = 3.0 ; r=3 gap
        assert rows[1].r_star == pytest.approx(1.0)
        assert rows[2].r_star == pytest.approx(3.0)
        assert rows[3].r_star is None

    def test_unseen_mass_from_r1_row(self, spark):
        from saber_spark.operators.lm import good_turing
        toks = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("c",)], "token string")
        rows = {r.r: r for r in good_turing(toks).collect()}
        # p0 = n_1 / N = 2 / 4
        assert rows[1].n_r / 4 == pytest.approx(0.5)


class TestZipfFit:
    def test_geometric_spectrum_fits_negative_slope(self, spark):
        from saber_spark.operators.vocab import zipf_fit
        # freqs 64,32,16,8 over ranks 1..4: log-linear in rank, not in
        # ln(rank), so the fit is negative with high-but-not-perfect R^2
        rows = ([("t1",)] * 64 + [("t2",)] * 32 + [("t3",)] * 16
                + [("t4",)] * 8)
        r = zipf_fit(spark.createDataFrame(rows, "token string")).first()
        assert r.n_types == 4
        assert r.slope < 0 and r.r2 > 0.93

    def test_exact_fit_on_true_zipf(self, spark):
        from saber_spark.operators.vocab import zipf_fit
        # freq = 24/rank for ranks 1,2,3,4 -> 24,12,8,6: exact slope -1
        rows = ([("a",)] * 24 + [("b",)] * 12 + [("c",)] * 8
                + [("d",)] * 6)
        r = zipf_fit(spark.createDataFrame(rows, "token string")).first()
        assert r.slope == pytest.approx(-1.0, abs=1e-6)
        assert r.intercept == pytest.approx(round(math.log(24), 6),
                                            abs=1e-6)
        assert r.r2 == pytest.approx(1.0, abs=1e-6)

    def test_tie_break_is_deterministic(self, spark):
        from saber_spark.operators.vocab import zipf_fit
        rows = [("b",), ("a",), ("c",)]  # all freq 1 — ranks by token ASC
        r1 = zipf_fit(spark.createDataFrame(rows, "token string")).first()
        r2 = zipf_fit(spark.createDataFrame(
            list(reversed(rows)), "token string")).first()
        assert (r1.slope, r1.intercept) == (r2.slope, r2.intercept)


class TestTemporalConflicts:
    def _hist(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, "
                  "valid_from long, valid_to long")

    def test_overlap_detection_and_window(self, spark):
        from saber_spark.operators.triples import temporal_conflicts
        rows = [
            ("e1", "hasCEO", "alice", 0, 5),
            ("e1", "hasCEO", "bob", 4, 9),     # overlaps alice on [4,5]
            ("e1", "hasCEO", "carol", 6, 9),   # overlaps bob only
            ("e2", "hasCEO", "dan", 0, 3),
            ("e2", "hasCEO", "erin", 4, 8),    # adjacent, NO overlap
        ]
        out = {(r.subj, r.obj_a, r.obj_b): (r.overlap_from, r.overlap_to)
               for r in temporal_conflicts(
                   self._hist(spark, rows), ["hasCEO"]).collect()}
        assert out == {("e1", "alice", "bob"): (4, 5),
                       ("e1", "bob", "carol"): (6, 9)}

    def test_non_functional_pred_ignored(self, spark):
        from saber_spark.operators.triples import temporal_conflicts
        rows = [("e1", "likes", "x", 0, 9), ("e1", "likes", "y", 0, 9)]
        assert temporal_conflicts(
            self._hist(spark, rows), ["hasCEO"]).count() == 0

    def test_same_object_reassertion_is_not_a_conflict(self, spark):
        from saber_spark.operators.triples import temporal_conflicts
        rows = [("e1", "hasCEO", "alice", 0, 2),
                ("e1", "hasCEO", "alice", 5, 9)]
        assert temporal_conflicts(
            self._hist(spark, rows), ["hasCEO"]).count() == 0


class TestPhoneticBlocking:
    def test_sound_alike_names_share_a_key(self, spark):
        from saber_spark.operators.canonicalize import phonetic_blocking
        names = spark.createDataFrame(
            [("robert",), ("rupert",), ("smith",), ("smyth",),
             ("ashcraft",)], "name string")
        out = {r.name: (r.pkey, r.block_size)
               for r in phonetic_blocking(names).collect()}
        assert out["robert"][0] == out["rupert"][0] == "r163"
        assert out["smith"][0] == out["smyth"][0]
        assert out["smith"][1] == 2
        assert out["ashcraft"][1] == 1

    def test_key_shape_short_name_zero_padded(self, spark):
        from saber_spark.operators.canonicalize import phonetic_blocking
        names = spark.createDataFrame([("lee",), ("lu",)], "name string")
        out = {r.name: r.pkey for r in phonetic_blocking(names).collect()}
        assert out["lee"] == "l000"
        assert out["lu"] == "l000"

    def test_run_collapse_and_truncation(self, spark):
        from saber_spark.operators.canonicalize import phonetic_key
        import pyspark.sql.functions as SF
        df = spark.range(1).select(
            phonetic_key(SF.lit("pfisterschmidt")).alias("k"))
        # tail codes 1,2,3,6,2,2,5,3,3 -> runs collapse -> 1236253,
        # key p1236253 truncates to 4 chars
        assert df.first().k == "p123"


class TestEntityHindex:
    def test_hand_computed_h(self, spark):
        from saber_spark.operators.linking import entity_hindex
        # e1: docs with mention counts [5, 3, 3, 1] -> h = 3
        # e2: one doc with 10 mentions -> h = 1 (depth without breadth)
        # e3: four docs with 1 mention -> h = 1 (breadth without depth)
        rows = ([("e1", 1)] * 5 + [("e1", 2)] * 3 + [("e1", 3)] * 3
                + [("e1", 4)] + [("e2", 9)] * 10
                + [("e3", 1), ("e3", 2), ("e3", 3), ("e3", 4)])
        linked = spark.createDataFrame(rows, "label string, doc_id long")
        out = {r.label: r for r in entity_hindex(linked).collect()}
        assert out["e1"].h_index == 3
        assert out["e1"].n_docs == 4
        assert out["e1"].total_mentions == 12
        assert out["e2"].h_index == 1
        assert out["e3"].h_index == 1

    def test_h_equals_docs_when_square(self, spark):
        from saber_spark.operators.linking import entity_hindex
        # 3 docs x 3 mentions -> h = 3 exactly
        rows = [("e", d) for d in (1, 2, 3) for _ in range(3)]
        linked = spark.createDataFrame(rows, "label string, doc_id long")
        assert entity_hindex(linked).first().h_index == 3


class TestUrlTemplates:
    def test_template_families_and_path_counts(self, spark):
        from saber_spark.operators.webstats import url_templates
        pages = spark.createDataFrame([
            ("https://a.org/news/2024/5/doc11",),
            ("https://a.org/news/2023/12/doc900",),
            ("https://a.org/news/2024/5/doc11",),   # duplicate path
            ("https://cdn.org/p/deadbeef1234",),    # 12-char hex run
            ("https://cdn.org/p/cafe1234cafe",),
        ], "url string")
        out = {(r.host, r.template): (r.n_pages, r.n_paths)
               for r in url_templates(pages).collect()}
        assert out[("a.org", "/news/{d}/{d}/doc{d}")] == (3, 2)
        assert out[("cdn.org", "/p/{h}")] == (2, 2)

    def test_hex_collapses_before_digits(self, spark):
        from saber_spark.operators.webstats import url_templates
        # a 10-digit run is also a >=8-char hex run -> {h}, not {d}
        pages = spark.createDataFrame(
            [("https://x.org/id/1234567890",),
             ("https://x.org/v/12",)], "url string")
        got = {r.template for r in url_templates(pages).collect()}
        assert got == {"/id/{h}", "/v/{d}"}


class TestKgAlignDfFrac:
    def test_relative_cut_drops_hub_keeps_rare(self, spark):
        from saber_spark.operators.triples import kg_align
        # 10 entities per side: hub fact shared by ALL (df=10 > 0.5*10),
        # rare fact unique per entity pair (df=1 <= 5)
        a = spark.createDataFrame(
            [(f"a{i}", "type", "thing") for i in range(10)]
            + [(f"a{i}", "key", f"k{i}") for i in range(10)],
            "subj string, pred string, obj string")
        b = spark.createDataFrame(
            [(f"b{i}", "type", "thing") for i in range(10)]
            + [(f"b{i}", "key", f"k{i}") for i in range(10)],
            "subj string, pred string, obj string")
        out = kg_align(a, b, threshold=0.5, max_df_frac=0.5)
        rows = {(r.ent_a, r.ent_b): r for r in out.collect()}
        # hub 'type' pruned -> each entity keeps only its unique key
        # fact, so the true pairs align at jaccard 1.0 and n_a = n_b = 1
        assert set(rows) == {(f"a{i}", f"b{i}") for i in range(10)}
        assert all(r.jaccard == 1.0 and r.n_a == 1 for r in rows.values())

    def test_without_cut_hub_dilutes_scores(self, spark):
        from saber_spark.operators.triples import kg_align
        a = spark.createDataFrame(
            [(f"a{i}", "type", "thing") for i in range(10)]
            + [(f"a{i}", "key", f"k{i}") for i in range(10)],
            "subj string, pred string, obj string")
        b = spark.createDataFrame(
            [(f"b{i}", "type", "thing") for i in range(10)]
            + [(f"b{i}", "key", f"k{i}") for i in range(10)],
            "subj string, pred string, obj string")
        out = {(r.ent_a, r.ent_b): r
               for r in kg_align(a, b, threshold=0.5).collect()}
        # un-cut: true pairs share 2 of 2 facts (jaccard 1.0) but the
        # candidate set also carried the 100 hub-only pairs upstream
        assert out[("a3", "b3")].n_shared == 2
        assert out[("a3", "b3")].jaccard == 1.0


class TestSubpropEntail:
    def _schema(self, spark):
        sub = spark.createDataFrame(
            [("knows", "related"), ("related", "linked")],
            "child string, parent string")
        inv = spark.createDataFrame(
            [("knows", "known_by")], "pred string, inverse string")
        return sub, inv

    def test_rdfs7_over_rdfs5_chain(self, spark):
        from saber_spark.operators.ontology import subprop_entail
        sub, _ = self._schema(spark)
        t = spark.createDataFrame([("a", "knows", "b")],
                                  "subj string, pred string, obj string")
        got = {(r.subj, r.pred, r.obj)
               for r in subprop_entail(t, sub).collect()}
        # 2-deep chain: knows -> related -> linked all materialize
        assert got == {("a", "knows", "b"), ("a", "related", "b"),
                       ("a", "linked", "b")}

    def test_inverse_then_expansion(self, spark):
        from saber_spark.operators.ontology import subprop_entail
        sub = spark.createDataFrame(
            [("known_by", "mentioned_by")], "child string, parent string")
        inv = spark.createDataFrame(
            [("knows", "known_by")], "pred string, inverse string")
        t = spark.createDataFrame([("a", "knows", "b")],
                                  "subj string, pred string, obj string")
        got = {(r.subj, r.pred, r.obj)
               for r in subprop_entail(t, sub, inv).collect()}
        # flipped fact (b known_by a) expands along the inverse's OWN
        # super-property
        assert got == {("a", "knows", "b"), ("b", "known_by", "a"),
                       ("b", "mentioned_by", "a")}

    def test_set_semantics_absorbs_double_declaration(self, spark):
        from saber_spark.operators.ontology import subprop_entail
        sub, inv = self._schema(spark)
        both = spark.createDataFrame(
            [("knows", "known_by"), ("known_by", "knows")],
            "pred string, inverse string")
        t = spark.createDataFrame(
            [("a", "knows", "b"), ("b", "known_by", "a")],
            "subj string, pred string, obj string")
        out = subprop_entail(t, sub, both).collect()
        assert len(out) == len({(r.subj, r.pred, r.obj) for r in out})


class TestSameasRewrite:
    def test_chain_closes_and_facts_collapse(self, spark):
        from saber_spark.operators.triples import sameas_rewrite
        t = spark.createDataFrame(
            [("dup2:1", "placed", "order:9"),
             ("dup:1", "placed", "order:9"),   # collapses with the above
             ("cust:2", "placed", "order:8"),
             ("order:9", "contains", "part:7")],
            "subj string, pred string, obj string")
        pairs = spark.createDataFrame(
            [("dup:1", "cust:1"), ("dup2:1", "dup:1")],
            "a string, b string")
        got = {(r.subj, r.pred, r.obj)
               for r in sameas_rewrite(t, pairs, rounds=4).collect()}
        assert got == {("cust:1", "placed", "order:9"),
                       ("cust:2", "placed", "order:8"),
                       ("order:9", "contains", "part:7")}

    def test_objects_rewrite_too(self, spark):
        from saber_spark.operators.triples import sameas_rewrite
        t = spark.createDataFrame(
            [("a", "knows", "dup:x")], "subj string, pred string, obj string")
        pairs = spark.createDataFrame(
            [("dup:x", "canon:x")], "a string, b string")
        out = sameas_rewrite(t, pairs, rounds=2).collect()
        assert [(r.subj, r.pred, r.obj) for r in out] \
            == [("a", "knows", "canon:x")]

    def test_merge_of_merges(self, spark):
        from saber_spark.operators.triples import sameas_rewrite
        # two alignment rounds produced (x, y) and (y, z): all three ids
        # must land on the same representative
        t = spark.createDataFrame(
            [("x", "p", "o1"), ("y", "p", "o1"), ("z", "p", "o1")],
            "subj string, pred string, obj string")
        pairs = spark.createDataFrame(
            [("x", "y"), ("y", "z")], "a string, b string")
        out = sameas_rewrite(t, pairs, rounds=4).collect()
        assert [(r.subj, r.pred, r.obj) for r in out] == [("x", "p", "o1")]


class TestNoisyOr:
    def test_hand_computed_fusion(self, spark):
        from saber_spark.operators.triples import noisyor_confidence
        ev = spark.createDataFrame(
            [("s", "p", "o", 0.5), ("s", "p", "o", 0.5),
             ("s", "p", "x", 0.9)],
            "subj string, pred string, obj string, conf double")
        out = {(r.subj, r.pred, r.obj): (r.n_sources, r.conf)
               for r in noisyor_confidence(ev).collect()}
        # 1 - 0.5*0.5 = 0.75 ; single source passes through
        assert out[("s", "p", "o")] == (2, 0.75)
        assert out[("s", "p", "x")] == (1, 0.9)

    def test_certainty_and_clamping(self, spark):
        from saber_spark.operators.triples import noisyor_confidence
        ev = spark.createDataFrame(
            [("s", "p", "o", 1.0), ("s", "p", "o", 0.1),
             ("t", "p", "o", -0.3)],
            "subj string, pred string, obj string, conf double")
        out = {r.subj: r.conf for r in noisyor_confidence(ev).collect()}
        assert out["s"] == 1.0        # c=1.0 clamps to 1-eps -> rounds to 1
        assert out["t"] == 0.0        # negative conf clamps to 0

    def test_belief_monotone_in_sources(self, spark):
        from saber_spark.operators.triples import noisyor_confidence
        rows = [("s", "p", "o", 0.3)] * 5
        ev = spark.createDataFrame(
            rows, "subj string, pred string, obj string, conf double")
        c5 = noisyor_confidence(ev).first().conf
        assert abs(c5 - (1 - 0.7 ** 5)) < 1e-6


class TestAllenRelations:
    def _hist(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, "
                  "valid_from long, valid_to long")

    def test_all_thirteen_relations(self, spark):
        from saber_spark.operators.triples import allen_relations
        # obj_a = 'a' always sorts before obj_b = 'b'; B fixed [10, 20]
        cases = {
            (10, 20): "equals",
            (0, 8): "precedes",      (0, 9): "meets",
            (23, 30): "preceded_by", (21, 30): "met_by",
            (10, 15): "starts",      (10, 25): "started_by",
            (15, 20): "finishes",    (5, 20): "finished_by",
            (12, 18): "during",      (5, 25): "contains",
            (5, 15): "overlaps",     (15, 25): "overlapped_by",
        }
        rows = []
        for i, (fa, ta) in enumerate(cases):
            rows += [(f"s{i}", "p", "a", fa, ta),
                     (f"s{i}", "p", "b", 10, 20)]
        out = {(r.from_a, r.to_a): r.relation
               for r in allen_relations(self._hist(spark, rows)).collect()}
        assert out == cases

    def test_exactly_one_relation_per_pair(self, spark):
        from saber_spark.operators.triples import allen_relations
        rows = [("s", "p", "a", 0, 5), ("s", "p", "b", 3, 9),
                ("s", "p", "c", 6, 7)]
        out = allen_relations(self._hist(spark, rows)).collect()
        assert len(out) == 3  # C(3,2) pairs, one row each
        assert all(r.relation for r in out)
