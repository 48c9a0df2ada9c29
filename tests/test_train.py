"""Tests for distributed Viterbi training + transfer learning."""

import pytest

from saber_spark.sources.conll import load_conll_dir
from saber_spark.train import prepare_for_transfer, train_viterbi_tagger

TRAIN = """The\tO
patient\tO
has\tO
cancer\tB-DISO
of\tI-DISO
lung\tI-DISO
.\tO

cancer\tB-DISO
kills\tO
.\tO

The\tO
lung\tO
works\tO
.\tO
"""

TARGET = """p53\tB-PRGE
binds\tO
DNA\tB-PRGE
.\tO

The\tO
p53\tB-PRGE
mutates\tO
.\tO
"""


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    d1 = tmp_path_factory.mktemp("src")
    (d1 / "train.tsv").write_text(TRAIN)
    d2 = tmp_path_factory.mktemp("tgt")
    (d2 / "train.tsv").write_text(TARGET)
    return (load_conll_dir(spark, str(d1)), load_conll_dir(spark, str(d2)))


class TestTraining:
    def test_memorizes_training_sentences(self, spark, corpora):
        src, _ = corpora
        model = train_viterbi_tagger(src)
        rows = src.collect()
        sents = [r["tokens"] for r in rows]
        gold = [r["tags"] for r in rows]
        pred = model.predict_tags(sents)
        # context-sensitivity: 'lung' is I-DISO after 'cancer of' but O in
        # 'The lung works' — transitions must disambiguate what emissions
        # alone cannot
        assert pred == gold

    def test_unseen_words_get_valid_bio(self, spark, corpora):
        src, _ = corpora
        model = train_viterbi_tagger(src)
        tags = model.predict_tags([["totally", "novel", "words"]])[0]
        assert len(tags) == 3
        assert all(not t.startswith("I") or i > 0 for i, t in enumerate(tags))

    def test_transfer_swaps_head_keeps_vocab(self, spark, corpora):
        src, tgt = corpora
        base = train_viterbi_tagger(src)
        transferred = prepare_for_transfer(base, tgt)
        # vocab frozen: same object/ids as source
        assert transferred.word_to_idx == base.word_to_idx
        # head resized to target tag set
        assert "B-PRGE" in transferred.tags
        assert "B-DISO" not in transferred.tags
        # target surfaces unseen in source ('p53') are UNK yet still tagged
        # via the target head (UNK emission favors B-PRGE contexts)
        pred = transferred.predict_tags([["The", "p53", "mutates", "."]])[0]
        assert len(pred) == 4
        assert pred[0] == "O"

    def test_trained_model_in_spark_stage(self, spark, corpora):
        """A trained model drives the mapInPandas stage via broadcast —
        same slot as the dictionary model."""
        from saber_spark.operators.tagger import _MODEL_CACHE, detect_mentions

        src, _ = corpora
        model = train_viterbi_tagger(src)
        # ship the trained model itself (numpy arrays broadcast fine)
        payload = model
        _MODEL_CACHE.clear()
        bc = spark.sparkContext.broadcast(payload)
        extracted = spark.createDataFrame(
            [("u", "The patient has cancer of lung .")],
            "url string, doc_text string")
        # _build_model passes non-dict payloads through if they quack
        rows = detect_mentions(extracted, bc).collect()
        got = {(r["text"], r["label"]) for r in rows}
        assert got == {("cancer of lung", "DISO")}


class TestTrainedArtifactRoundtrip:
    def test_saved_model_predicts_identically(self, spark, tmp_path):
        """A trained Viterbi model saved with weights and rebuilt through
        the tagger's payload factory must predict the same tags (the saved
        artifact previously dropped the fitted matrices)."""
        from saber_spark.artifacts import load_model_payload, save_model_dir
        from saber_spark.operators.tagger import _build_model
        from saber_spark.train import train_viterbi_tagger

        rows = [(["p53", "binds", "dna"], ["B-PRGE", "O", "O"]),
                (["cancer", "hurts"], ["B-DISO", "O"]),
                (["p53", "and", "cancer"], ["B-PRGE", "O", "B-DISO"])] * 4
        src = spark.createDataFrame(rows, "tokens array<string>, tags array<string>")
        model = train_viterbi_tagger(src)
        d = str(tmp_path / "m")
        save_model_dir(d, kind="viterbi", surface_map={},
                       word_to_idx=model.word_to_idx,
                       weights={"emissions": model.emissions,
                                "transitions": model.transitions},
                       config={"tags": model.tags})
        rebuilt = _build_model(load_model_payload(d))
        probe = [["p53", "binds", "cancer"], ["totally", "new", "words"]]
        assert rebuilt.predict_tags(probe) == model.predict_tags(probe)
        assert rebuilt.predict_tags([["p53"]]) == [["B-PRGE"]]
