"""O27 visualization: deterministic displaCy-style entity rendering.

Reference: saber/saber.py:124-126 (displacy.render manual ents) with the
per-label colours of saber/constants.py:8-16.
"""

from saber_spark.visualize import COLOURS, render_document_html


class TestRenderPython:
    def test_basic_markup(self):
        text = "p53 binds DNA."
        mentions = [{"start": 0, "end": 3, "label": "PRGE"}]
        html = render_document_html(text, mentions)
        assert html.startswith('<div class="entities">')
        assert COLOURS["PRGE"] in html
        assert ">p53<span" in html
        assert html.endswith(" binds DNA.</div>")

    def test_escapes_text(self):
        html = render_document_html(
            "a <b> & c", [{"start": 2, "end": 5, "label": "DISO"}])
        assert "&lt;b&gt;" in html and "&amp;" in html
        assert "<b>" not in html

    def test_overlap_keeps_earliest_then_longest(self):
        text = "abcdef"
        mentions = [{"start": 0, "end": 4, "label": "CHED"},
                    {"start": 2, "end": 6, "label": "DISO"},  # overlaps: drop
                    {"start": 0, "end": 2, "label": "LIVB"}]  # shorter: drop
        html = render_document_html(text, mentions)
        assert html.count("<mark") == 1
        assert ">abcd<span" in html

    def test_unknown_label_default_colour(self):
        html = render_document_html("x", [{"start": 0, "end": 1,
                                           "label": "ZZZ"}])
        assert "background: #ddd" in html

    def test_deterministic(self):
        text = "aspirin treats headache."
        ms = [{"start": 0, "end": 7, "label": "CHED"},
              {"start": 15, "end": 23, "label": "DISO"}]
        assert render_document_html(text, ms) == render_document_html(text, ms)


class TestRenderDataFrame:
    def test_matches_python_twin(self, spark):
        """Distributed built-in rendering == the Python kernel on markup-free
        text (the DF path's documented contract)."""
        from saber_spark.visualize import render_mentions_df
        text = "p53 binds DNA. aspirin treats headache."
        docs = spark.createDataFrame([("u1", text), ("u2", "no entities")],
                                     "url string, doc_text string")
        mentions = spark.createDataFrame(
            [("u1", 0, 3, "PRGE"), ("u1", 15, 22, "CHED")],
            "url string, start int, end int, label string")
        got = {r["url"]: r["html"]
               for r in render_mentions_df(docs, mentions).collect()}
        expect_u1 = render_document_html(
            text, [{"start": 0, "end": 3, "label": "PRGE"},
                   {"start": 15, "end": 22, "label": "CHED"}])
        assert got["u1"] == expect_u1
        assert got["u2"] == '<div class="entities">no entities</div>'

    def test_overlap_tiebreak_matches_python_twin(self, spark):
        """Same-start overlap keeps the LONGEST span on both paths."""
        from saber_spark.visualize import render_mentions_df
        text = "abcdefgh"
        mentions_py = [{"start": 0, "end": 2, "label": "LIVB"},
                       {"start": 0, "end": 5, "label": "CHED"},
                       {"start": 3, "end": 7, "label": "DISO"}]  # overlaps
        docs = spark.createDataFrame([("u", text)],
                                     "url string, doc_text string")
        mdf = spark.createDataFrame(
            [("u", m["start"], m["end"], m["label"]) for m in mentions_py],
            "url string, start int, end int, label string")
        got = render_mentions_df(docs, mdf).first()["html"]
        assert got == render_document_html(text, mentions_py)
        assert ">abcde<span" in got and got.count("<mark") == 1

    def test_no_python_eval_in_plan(self, spark):
        from saber_spark.visualize import render_mentions_df
        docs = spark.createDataFrame([("u", "t")], "url string, doc_text string")
        mentions = spark.createDataFrame(
            [("u", 0, 1, "PRGE")], "url string, start int, end int, label string")
        plan = render_mentions_df(docs, mentions)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "EvalPython" not in plan
