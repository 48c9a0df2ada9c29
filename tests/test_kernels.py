"""Golden-value tests ported from the reference test suite.

Sources (in /root/reference):
  - saber/tests/test_text_utils.py:18-67   (tokenizer goldens)
  - saber/tests/test_preprocessor.py:23-36 (offsets), 82-100 (chunker),
    102-117 (sterilize)
  - saber/tests/test_metrics.py:87-99      (criteria validation)
"""

import pytest

from saber_spark.kernels import (
    chunk_entities,
    get_precision_recall_f1_support,
    precision_recall_f1_support,
    sterilize,
    tokenize,
)
from saber_spark.kernels.text import (
    extract_html_text,
    process_text,
    sentence_spans,
    tokenize_with_offsets,
)


class TestTokenizer:
    def test_blank(self):
        assert tokenize("") == []

    def test_simple(self):
        assert tokenize("This is an easy test.") == [
            "This", "is", "an", "easy", "test", "."]

    def test_complicated(self):
        text = ("This test's tokenizers handeling of very-tricky situations, "
                "3X, more/or/less.")
        assert tokenize(text) == [
            "This", "test", "'", "s", "tokenizers", "handeling", "of",
            "very", "-", "tricky", "situations", ",", "3X", ",", "more", "/",
            "or", "/", "less", "."]

    def test_from_CHED_ds(self):
        text = ("The results have shown that the degradation product "
                "p-choloroaniline is not a significant factor in "
                "chlorhexidine-digluconate associated erosive cystitis.")
        assert tokenize(text) == [
            "The", "results", "have", "shown", "that", "the", "degradation",
            "product", "p", "-", "choloroaniline", "is", "not", "a",
            "significant", "factor", "in", "chlorhexidine", "-",
            "digluconate", "associated", "erosive", "cystitis", "."]

    def test_from_DISO_ds(self):
        text = ("Rats were treated with seven day intravenous infusion of "
                "fucoidan (30 micrograms h-1) or vehicle.")
        assert tokenize(text) == [
            "Rats", "were", "treated", "with", "seven", "day", "intravenous",
            "infusion", "of", "fucoidan", "(", "30", "micrograms", "h", "-",
            "1", ")", "or", "vehicle", "."]

    def test_from_LIVB_ds(self):
        text = ("Methanoregula formicica sp. nov., a methane-producing "
                "archaeon isolated from methanogenic sludge.")
        assert tokenize(text) == [
            "Methanoregula", "formicica", "sp", ".", "nov", ".", ",", "a",
            "methane", "-", "producing", "archaeon", "isolated", "from",
            "methanogenic", "sludge", "."]

    def test_from_PRGE_ds(self):
        text = ("Here we report the cloning, expression, and biochemical "
                "characterization of the 32-kDa subunit of human (h) TFIID, "
                "termed hTAFII32.")
        assert tokenize(text) == [
            "Here", "we", "report", "the", "cloning", ",", "expression", ",",
            "and", "biochemical", "characterization", "of", "the", "32", "-",
            "kDa", "subunit", "of", "human", "(", "h", ")", "TFIID", ",",
            "termed", "hTAFII32", "."]


class TestSterilize:
    def test_surrounding_spaces(self):
        assert sterilize(" This is an easy test. ") == "This is an easy test."

    def test_multiple_spaces(self):
        assert (sterilize("This  is a test   with improper  spacing. ")
                == "This is a test with improper spacing.")

    def test_blank(self):
        assert sterilize("") == ""

    def test_lower(self):
        assert sterilize(" A  B ", lower=True) == "a b"


class TestProcessText:
    def test_simple(self):
        sents, offsets = process_text("Simple example. With two sentences!")
        assert sents == [["Simple", "example", "."],
                         ["With", "two", "sentences", "!"]]
        assert offsets == [[(0, 6), (7, 14), (14, 15)],
                           [(16, 20), (21, 24), (25, 34), (34, 35)]]

    def test_blank(self):
        assert process_text("") == ([], [])

    def test_offsets_slice_back(self):
        text = "Alpha beta. Gamma?"
        _, offsets = process_text(text)
        toks = tokenize_with_offsets(text)
        for tok, a, b in toks:
            assert text[a:b] == tok
        flat = [o for sent in offsets for o in sent]
        assert flat == [(a, b) for _, a, b in toks]

    def test_sentence_spans(self):
        assert sentence_spans("A b. C d! E?") == [(0, 4), (5, 9), (10, 12)]
        assert sentence_spans("") == []
        assert sentence_spans("no terminal") == [(0, 11)]


class TestChunkEntities:
    def test_simple(self):
        assert chunk_entities(["B-PRGE", "I-PRGE", "O", "B-PRGE"]) == [
            ("PRGE", 0, 2), ("PRGE", 3, 4)]

    def test_two_types(self):
        assert chunk_entities(["B-LIVB", "I-LIVB", "O", "B-PRGE"]) == [
            ("LIVB", 0, 2), ("PRGE", 3, 4)]

    def test_invalid_orphan_I(self):
        assert chunk_entities(["O", "I-CHED", "I-CHED", "O"]) == []

    def test_blank(self):
        assert chunk_entities([]) == []

    def test_adjacent_B(self):
        assert chunk_entities(["B-DISO", "B-DISO"]) == [
            ("DISO", 0, 1), ("DISO", 1, 2)]

    def test_bioes_E_closes(self):
        # Reference behavior: E- does not extend a B- chunk (only I- of the
        # same type does); see inner loop at saber/preprocessor.py:215-219.
        assert chunk_entities(["B-DISO", "E-DISO"]) == [("DISO", 0, 1)]

    def test_type_switch_I(self):
        assert chunk_entities(["B-DISO", "I-PRGE"]) == [("DISO", 0, 1)]


class TestMetrics:
    def test_prf_formulae(self):
        assert precision_recall_f1_support(0, 5, 5) == (0.0, 0.0, 0.0, 5)
        p, r, f1, s = precision_recall_f1_support(3, 1, 2)
        assert p == 0.75 and r == 0.6 and s == 5
        assert abs(f1 - 2 * p * r / (p + r)) < 1e-12

    def test_invalid_criteria_raises(self):
        with pytest.raises(ValueError):
            get_precision_recall_f1_support([("A", 0, 1)], [], criteria="nope")

    def test_exact(self):
        gold = [("DISO", 0, 2), ("DISO", 3, 4), ("PRGE", 5, 6)]
        pred = [("DISO", 0, 2), ("DISO", 3, 5), ("PRGE", 5, 6)]
        scores = get_precision_recall_f1_support(gold, pred, "exact")
        assert scores["DISO"][:2] == (0.5, 0.5)
        assert scores["PRGE"][:2] == (1.0, 1.0)
        assert scores["MICRO_AVG"][0] == pytest.approx(2 / 3)
        assert scores["MACRO_AVG"][0] == pytest.approx(0.75)
        assert scores["MACRO_AVG"][3] == 3

    def test_left_right(self):
        gold = [("DISO", 0, 2)]
        pred = [("DISO", 0, 9)]
        assert get_precision_recall_f1_support(gold, pred, "left")["DISO"][2] == 1.0
        assert get_precision_recall_f1_support(gold, pred, "right")["DISO"][2] == 0.0

    def test_pred_only_label_ignored(self):
        # Reference enumerates labels from y_true only (saber/metrics.py:151).
        scores = get_precision_recall_f1_support(
            [("A", 0, 1)], [("A", 0, 1), ("B", 2, 3)], "exact")
        assert "B" not in scores
        assert scores["A"][2] == 1.0


class TestHtmlExtract:
    def test_basic(self):
        html = b"<html><body><p>Hello   world.</p><p>Bye!</p></body></html>"
        assert extract_html_text(html) == "Hello world. Bye!"

    def test_script_style_dropped(self):
        html = ("<html><head><style>p{color:red}</style>"
                "<script>var x=1;</script></head>"
                "<body>Real &amp; text</body></html>")
        assert extract_html_text(html) == "Real & text"

    def test_byte_identity_with_sterilize(self):
        # The invariant: extracting wrapped text == sterilize(raw text).
        raw = "  Some   spaced\ttext. "
        html = f"<html><body><p>{raw}</p></body></html>".encode()
        assert extract_html_text(html) == sterilize(raw)

    def test_none_and_empty(self):
        assert extract_html_text(None) == ""
        assert extract_html_text(b"") == ""


class TestArticleXml:
    """Hermetic parity with the parsing half of the reference's PubMed path
    (saber/utils/app_utils.py:63-80): recurse to ArticleTitle /
    Abstract > AbstractText."""

    XML = ("<PubmedArticleSet><PubmedArticle><MedlineCitation>"
           "<PMID>123</PMID><Article>"
           "<ArticleTitle>P53 &amp; cancer: a review.</ArticleTitle>"
           "<Abstract><AbstractText>The protein p53 binds DNA."
           "</AbstractText></Abstract>"
           "</Article></MedlineCitation></PubmedArticle></PubmedArticleSet>")

    def test_extracts_title_and_abstract(self):
        from saber_spark.kernels.text import extract_article_fields
        title, abstract = extract_article_fields(self.XML)
        assert title == "P53 & cancer: a review."
        assert abstract == "The protein p53 binds DNA."

    def test_article_root_without_set_wrapper(self):
        from saber_spark.kernels.text import extract_article_fields
        inner = self.XML.replace("<PubmedArticleSet>", "").replace(
            "</PubmedArticleSet>", "")
        assert extract_article_fields(inner)[0] == "P53 & cancer: a review."

    def test_missing_fields_and_garbage(self):
        from saber_spark.kernels.text import extract_article_fields
        assert extract_article_fields(None) == (None, None)
        assert extract_article_fields("not xml <<<") == (None, None)
        assert extract_article_fields("<PubmedArticle><MedlineCitation>"
                                      "<Article/></MedlineCitation>"
                                      "</PubmedArticle>") == (None, None)

    def test_bytes_input(self):
        from saber_spark.kernels.text import extract_article_fields
        assert extract_article_fields(self.XML.encode())[1] \
            == "The protein p53 binds DNA."
