"""Tests for the model slot: index-sequence plumbing (O8 parity) and the
Viterbi CRF-style tagger (O12/O13-shaped)."""

import random

import numpy as np
import pytest

from saber_spark.kernels.chunk import chunk_entities
from saber_spark.kernels.text import tokenize
from saber_spark.models import (
    MAX_SENT_LEN,
    NEG_INF,
    PAD_ID,
    UNK_ID,
    ViterbiCRFTagger,
    build_tag_vocab,
    build_transition_matrix,
    emissions_from_dictionary,
    to_index_sequences,
)
from saber_spark.operators.tagger import DictionaryTagger


def _word_index(sentences):
    vocab = sorted({t for s in sentences for t in s})
    return {w: i + 2 for i, w in enumerate(vocab)}  # PAD=0, UNK=1


class TestIndexSequences:
    def test_pad_truncate_post(self):
        """Right-pad with 0, truncate 'post' at 100/25 — reference parity
        (saber/preprocessor.py:180-193)."""
        long_sent = [f"w{i}" for i in range(120)]
        w2i = _word_index([long_sent])
        c2i = {c: i + 2 for i, c in enumerate("w0123456789")}
        word_idx, char_idx = to_index_sequences([long_sent, ["w0"]], w2i, c2i)
        assert word_idx.shape == (2, 100)
        assert char_idx.shape == (2, 100, 25)
        assert word_idx[0, 99] == w2i["w99"]          # tail truncated
        assert word_idx[1, 0] == w2i["w0"]
        assert (word_idx[1, 1:] == PAD_ID).all()      # right-padded
        assert char_idx[1, 0, 0] == c2i["w"]
        assert char_idx[1, 0, 2] == PAD_ID

    def test_unk_fallback(self):
        word_idx, _ = to_index_sequences([["known", "mystery"]],
                                         {"known": 2})
        assert word_idx[0, 0] == 2 and word_idx[0, 1] == UNK_ID

    def test_long_token_chars_truncated(self):
        c2i = {c: i + 2 for i, c in enumerate("abcdefghijklmnopqrstuvwxyz")}
        _, char_idx = to_index_sequences([["a" * 40]], {"x": 2}, c2i)
        assert (char_idx[0, 0] != PAD_ID).sum() == 25


class TestTransitions:
    def test_orphan_I_blocked(self):
        tags = build_tag_vocab(["PRGE", "DISO"])
        trans = build_transition_matrix(tags)
        idx = {t: i for i, t in enumerate(tags)}
        assert trans[idx["O"], idx["I-PRGE"]] == NEG_INF
        assert trans[idx["B-DISO"], idx["I-PRGE"]] == NEG_INF
        assert trans[idx["B-PRGE"], idx["I-PRGE"]] == 0.0
        assert trans[idx["I-PRGE"], idx["I-PRGE"]] == 0.0
        assert trans[idx["O"], idx["B-PRGE"]] == 0.0
        assert trans[idx["B-PRGE"], idx["<PAD>"]] == NEG_INF


class TestViterbiTagger:
    SURFACES = {
        ("spark",): "PRGE",
        ("slow",): "DISO",
        ("big", "data"): "PRGE",
    }

    def _tagger(self, sentences):
        return ViterbiCRFTagger.from_dictionary(
            self.SURFACES, _word_index(sentences))

    def test_single_token_surfaces(self):
        sents = [tokenize("spark is slow today .")]
        tags = self._tagger(sents).predict_tags(sents)[0]
        assert tags == ["B-PRGE", "O", "B-DISO", "O", "O"]

    def test_multi_token_surface(self):
        sents = [tokenize("the big data engine .")]
        tags = self._tagger(sents).predict_tags(sents)[0]
        assert tags == ["O", "B-PRGE", "I-PRGE", "O", "O"]

    def test_continuation_token_alone_stays_O(self):
        """'data' without a preceding 'big' must NOT become an orphan I-."""
        sents = [tokenize("data is everywhere .")]
        tags = self._tagger(sents).predict_tags(sents)[0]
        assert tags[0] == "O"
        assert all(not t.startswith("I") for t in tags)

    def test_always_valid_bio(self):
        """Random inputs never produce orphan-I sequences: the number of
        decoded chunks equals the number of B- tags."""
        rng = random.Random(5)
        words = ["spark", "slow", "big", "data", "x", "y", "the", "."]
        sents = [[rng.choice(words) for _ in range(rng.randint(1, 30))]
                 for _ in range(50)]
        tagger = self._tagger(sents)
        for sent, tags in zip(sents, tagger.predict_tags(sents)):
            assert len(tags) == len(sent)
            n_b = sum(t.startswith("B") for t in tags)
            assert len(chunk_entities(tags)) == n_b

    def test_oversized_sentence_tail_O(self):
        sent = ["spark"] + ["x"] * 150
        tags = self._tagger([sent]).predict_tags([sent])[0]
        assert len(tags) == 151
        assert tags[0] == "B-PRGE"
        assert set(tags[MAX_SENT_LEN:]) == {"O"}

    def test_agrees_with_dictionary_tagger_on_unambiguous(self):
        """Where surfaces don't overlap, the CRF decode must reproduce the
        dictionary tagger exactly."""
        sents = [tokenize("spark meets slow big data and spark again .")]
        viterbi = self._tagger(sents).predict_tags(sents)
        greedy = DictionaryTagger(self.SURFACES).predict_tags(sents)
        assert viterbi == greedy

    def test_empty(self):
        assert self._tagger([["x"]]).predict_tags([]) == []
        assert self._tagger([["x"]]).predict_tags([[]]) == [[]]


class TestEmissions:
    def test_shapes_and_pad(self):
        w2i = {"spark": 2, "big": 3, "data": 4}
        tags = build_tag_vocab(["PRGE"])
        em = emissions_from_dictionary(
            {("spark",): "PRGE", ("big", "data"): "PRGE"}, w2i, tags)
        assert em.shape == (5, len(tags))
        t_idx = {t: i for i, t in enumerate(tags)}
        assert em[2, t_idx["B-PRGE"]] == 3.0
        assert em[4, t_idx["I-PRGE"]] == 2.5
        assert em[PAD_ID, t_idx["<PAD>"]] == 0.0
        assert em[PAD_ID, t_idx["O"]] == NEG_INF


class TestSparkIntegration:
    def test_detect_mentions_with_viterbi_payload(self, spark):
        from saber_spark.operators.tagger import detect_mentions

        sents_text = "spark beats slow big data . spark wins ."
        extracted = spark.createDataFrame(
            [("u1", sents_text)], "url string, doc_text string")
        w2i = _word_index([tokenize(sents_text)])
        payload = {"kind": "viterbi",
                   "surface_map": TestViterbiTagger.SURFACES,
                   "word_to_idx": w2i}
        bc = spark.sparkContext.broadcast(payload)
        rows = detect_mentions(extracted, bc).collect()
        got = {(r["text"], r["label"], r["sent_id"]) for r in rows}
        assert got == {("spark", "PRGE", 0), ("slow", "DISO", 0),
                       ("big data", "PRGE", 0), ("spark", "PRGE", 1)}
