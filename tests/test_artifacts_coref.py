"""Tests: model artifact save/load/pack and the coref stage."""

import numpy as np
import pytest

from saber_spark.artifacts import (
    load_model_payload,
    pack_archive,
    save_model_dir,
    unpack_archive,
)
from saber_spark.kernels.text import tokenize
from saber_spark.operators.coref import resolve_coreferences, resolve_text
from saber_spark.operators.tagger import DictionaryTagger, detect_mentions

SURFACES = {("p53",): "PRGE", ("cancer",): "DISO", ("mice",): "LIVB",
            ("big", "data"): "PRGE"}


class TestArtifacts:
    def test_dict_roundtrip(self, tmp_path):
        d = str(tmp_path / "model")
        save_model_dir(d, kind="dict", surface_map=SURFACES,
                       config={"lang": "en"})
        payload = load_model_payload(d)
        assert payload == SURFACES
        tagger = DictionaryTagger(payload)
        assert tagger.predict_tags([["p53", "x"]]) == [["B-PRGE", "O"]]

    def test_viterbi_roundtrip(self, tmp_path):
        d = str(tmp_path / "model")
        w2i = {"p53": 2, "cancer": 3, "big": 4, "data": 5}
        save_model_dir(d, kind="viterbi", surface_map=SURFACES,
                       word_to_idx=w2i,
                       embedding_matrix=np.zeros((6, 4), dtype=np.float32))
        payload = load_model_payload(d)
        assert payload["kind"] == "viterbi"
        assert payload["surface_map"][("big", "data")] == "PRGE"
        assert payload["word_to_idx"]["p53"] == 2

    def test_pack_unpack(self, tmp_path):
        d = str(tmp_path / "model")
        save_model_dir(d, kind="dict", surface_map=SURFACES)
        archive = pack_archive(d, str(tmp_path / "model.tar.bz2"))
        restored = unpack_archive(archive, str(tmp_path / "restore"))
        assert load_model_payload(restored) == SURFACES

    def test_bad_kind(self, tmp_path):
        d = str(tmp_path / "model")
        save_model_dir(d, kind="transformer", surface_map=SURFACES)
        with pytest.raises(ValueError):
            load_model_payload(d)

    def test_viterbi_without_vocab_rejected(self, tmp_path):
        d = str(tmp_path / "model")
        save_model_dir(d, kind="viterbi", surface_map=SURFACES)
        with pytest.raises(ValueError):
            load_model_payload(d)


class TestCorefKernel:
    def test_pronoun_resolved_to_nearest(self):
        text = "p53 is mutated. It causes cancer."
        assert resolve_text(text, SURFACES) == \
            "p53 is mutated. p53 causes cancer."

    def test_class_restriction(self):
        # 'they' only resolves to LIVB; p53 (PRGE) is not eligible
        text = "p53 is here. They are waiting."
        assert resolve_text(text, SURFACES) == text
        text2 = "mice were treated. They improved."
        assert resolve_text(text2, SURFACES) == \
            "mice were treated. mice improved."

    def test_no_antecedent_unchanged(self):
        text = "It rains. p53 arrives."
        assert resolve_text(text, SURFACES) == text

    def test_multi_token_referent(self):
        text = "big data wins. It scales."
        assert resolve_text(text, SURFACES) == "big data wins. big data scales."

    def test_empty(self):
        assert resolve_text("", SURFACES) == ""


class TestCorefSpark:
    def test_stage_increases_mentions(self, spark):
        """Resolving 'It' -> 'p53' must yield the extra mention the
        reference's coref=True path would produce
        (docs/quick_start.md:101-120)."""
        extracted = spark.createDataFrame(
            [("u", "p53 is mutated. It causes cancer.")],
            "url string, doc_text string")
        bc = spark.sparkContext.broadcast(SURFACES)
        without = detect_mentions(extracted, bc).collect()
        resolved = resolve_coreferences(extracted, bc)
        with_coref = detect_mentions(resolved, bc).collect()
        texts_without = [(r["sent_id"], r["text"]) for r in without]
        texts_with = [(r["sent_id"], r["text"]) for r in with_coref]
        assert (1, "p53") not in texts_without
        assert (1, "p53") in texts_with
        assert len(with_coref) == len(without) + 1
