"""annotate() — the reference's flagship call (saber/saber.py:52-128)."""

import pytest

from saber_spark.api import annotate


class TestAnnotate:
    TEXT = "The  spark protein binds vector. Then slow disease appears."

    def test_schema_and_spans(self):
        ann = annotate(self.TEXT, title="t1")
        assert set(ann) == {"text", "title", "ents"}
        assert ann["title"] == "t1"
        # text is sterilized (double space collapsed)
        assert "  " not in ann["text"]
        for ent in ann["ents"]:
            assert ann["text"][ent["start"]:ent["end"]] == ent["text"]
        assert {e["text"] for e in ann["ents"]} >= {"spark", "vector", "slow"}

    def test_entity_filter_like_fanout(self):
        """ents dict filters labels; absent keys mean off
        (saber/utils/app_utils.py:117-142)."""
        only_diso = annotate(self.TEXT, ents={"DISO": True})
        assert {e["label"] for e in only_diso["ents"]} == {"DISO"}

    def test_grounding_attaches_multi_xrefs(self):
        ann = annotate(self.TEXT, ground=True)
        by_text = {e["text"]: e for e in ann["ents"]}
        assert len(by_text["spark"]["xrefs"]) == 2   # multi-xref surface
        assert by_text["spark"]["xrefs"][0]["namespace"] == "STRING"
        assert by_text["slow"]["xrefs"][0]["id"].startswith("DOID:")
        assert "organism-id" in by_text["spark"]["xrefs"][0]
        assert "organism-id" not in by_text["slow"]["xrefs"][0]

    def test_validation_matches_reference(self):
        """saber/saber.py:83-86: empty/invalid input raises ValueError."""
        with pytest.raises(ValueError):
            annotate("")
        with pytest.raises(ValueError):
            annotate(42)
        with pytest.raises(ValueError):
            annotate()

    def test_html_entry_point(self):
        html = b"<html><body><p>spark binds vector.</p></body></html>"
        ann = annotate(html=html)
        assert {e["text"] for e in ann["ents"]} == {"spark", "vector"}

    def test_matches_spark_pipeline_mentions(self, spark):
        """One-doc annotate == the distributed tagging stage on the same
        text (same kernels by construction)."""
        from saber_spark.fixtures.dictionary import surface_label_map
        from saber_spark.operators.extract import extract_text
        from saber_spark.operators.tagger import detect_mentions

        pages = spark.createDataFrame(
            [("u1", None, None, self.TEXT, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string")
        bc = spark.sparkContext.broadcast(surface_label_map())
        got = {(r["start"], r["end"], r["text"], r["label"])
               for r in detect_mentions(extract_text(pages), bc).collect()}
        expect = {(e["start"], e["end"], e["text"], e["label"])
                  for e in annotate(self.TEXT)["ents"]}
        assert got == expect and len(expect) >= 3


class TestAnnotateEdgeSemantics:
    def test_empty_ents_dict_disables_everything(self):
        """ents={} means NO types enabled (absent => off), not defaults."""
        ann = annotate("spark binds vector.", ents={})
        assert ann["ents"] == []
