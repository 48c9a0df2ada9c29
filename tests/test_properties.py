"""Property-based tests (hypothesis) for the pure kernels — the invariants
the 100 TB pipeline relies on for ANY input, not just goldens."""

from hypothesis import given, settings
from hypothesis import strategies as st

from saber_spark.kernels.chunk import chunk_entities
from saber_spark.kernels.metrics import get_precision_recall_f1_support
from saber_spark.kernels.text import (
    extract_html_text,
    process_text,
    sterilize,
    tokenize,
    tokenize_with_offsets,
)

texts = st.text(max_size=300)
labels = st.sampled_from(["PRGE", "DISO", "CHED", "LIVB"])
tags = st.one_of(
    st.just("O"),
    st.tuples(st.sampled_from(["B", "I", "E", "S"]), labels).map(
        lambda p: f"{p[0]}-{p[1]}"),
)
tag_seqs = st.lists(tags, max_size=30)


class TestSterilizeProperties:
    @given(texts)
    @settings(max_examples=200)
    def test_idempotent(self, t):
        once = sterilize(t)
        assert sterilize(once) == once

    @given(texts)
    def test_no_double_spaces_no_edges(self, t):
        s = sterilize(t)
        assert "  " not in s
        assert s == s.strip()


class TestTokenizerProperties:
    @given(texts)
    @settings(max_examples=200)
    def test_offsets_slice_back(self, t):
        for tok, a, b in tokenize_with_offsets(t):
            assert t[a:b] == tok
            assert a < b

    @given(texts)
    def test_offsets_strictly_increasing(self, t):
        offs = tokenize_with_offsets(t)
        for (_, _, e1), (_, s2, _) in zip(offs, offs[1:]):
            assert e1 <= s2

    @given(texts)
    def test_tokens_match_offset_variant(self, t):
        assert tokenize(t) == [tok for tok, _, _ in tokenize_with_offsets(t)]

    @given(texts)
    def test_no_whitespace_inside_tokens(self, t):
        for tok in tokenize(t):
            assert not any(c.isspace() for c in tok)


class TestProcessTextProperties:
    @given(texts)
    @settings(max_examples=150)
    def test_sentence_tokens_cover_all_tokens(self, t):
        s = sterilize(t)
        sents, offsets = process_text(s)
        flat = [tok for sent in sents for tok in sent]
        assert flat == tokenize(s)
        for sent, offs in zip(sents, offsets):
            assert len(sent) == len(offs)
            for tok, (a, b) in zip(sent, offs):
                assert s[a:b] == tok


class TestChunkerProperties:
    @given(tag_seqs)
    @settings(max_examples=300)
    def test_chunks_well_formed(self, seq):
        chunks = chunk_entities(seq)
        for lab, i, j in chunks:
            assert 0 <= i < j <= len(seq)
            assert seq[i].startswith("B")
            assert seq[i].split("-")[-1] == lab
            for k in range(i + 1, j):
                assert seq[k].startswith("I")
                assert seq[k].split("-")[-1] == lab

    @given(tag_seqs)
    def test_chunks_disjoint_ordered(self, seq):
        chunks = chunk_entities(seq)
        for (_, _, e1), (_, s2, _) in zip(chunks, chunks[1:]):
            assert e1 <= s2

    @given(tag_seqs)
    def test_chunk_count_equals_B_count(self, seq):
        assert len(chunk_entities(seq)) == sum(
            1 for t in seq if t.startswith("B"))


class TestMetricsProperties:
    chunks = st.lists(
        st.tuples(labels, st.integers(0, 5), st.integers(6, 10)),
        max_size=20).map(lambda xs: sorted(set(xs)))

    @given(chunks, chunks)
    @settings(max_examples=150)
    def test_identity_gives_perfect_scores(self, gold, _):
        if not gold:
            return
        scores = get_precision_recall_f1_support(gold, gold, "exact")
        assert scores["MICRO_AVG"][:3] == (1.0, 1.0, 1.0)

    @given(chunks, chunks)
    def test_bounds_and_support(self, gold, pred):
        for criteria in ("exact", "left", "right"):
            scores = get_precision_recall_f1_support(gold, pred, criteria)
            for lab, (p, r, f1, support) in scores.items():
                assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0 and 0.0 <= f1 <= 1.0
                assert support >= 0

    @given(chunks)
    def test_disjoint_gives_zero(self, gold):
        if not gold:
            return
        pred = [(lab, i + 100, j + 100) for lab, i, j in gold]
        scores = get_precision_recall_f1_support(gold, pred, "exact")
        assert scores["MICRO_AVG"][:3] == (0.0, 0.0, 0.0)


class TestHtmlProperties:
    @given(texts)
    @settings(max_examples=150)
    def test_wrap_extract_equals_sterilize(self, t):
        """The extraction invariant for arbitrary payload text that carries
        no markup metacharacters."""
        safe = t.replace("<", " ").replace(">", " ").replace("&", " ")
        html = f"<html><body><p>{safe}</p></body></html>".encode()
        assert extract_html_text(html) == sterilize(safe)


class TestArticleXmlProperties:
    # XML 1.0 cannot carry C0 control chars (or surrogates) at all
    xml_text = st.text(
        alphabet=st.characters(min_codepoint=0x20,
                               blacklist_categories=("Cs",)),
        max_size=120)

    @given(xml_text, xml_text)
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_through_xml(self, title, abstract):
        """Any title/abstract embedded into the article XML shape extracts
        back unchanged (after XML escaping)."""
        from xml.sax.saxutils import escape
        from saber_spark.kernels.text import extract_article_fields
        xml = ("<PubmedArticle><MedlineCitation><Article>"
               f"<ArticleTitle>{escape(title)}</ArticleTitle>"
               f"<Abstract><AbstractText>{escape(abstract)}</AbstractText>"
               "</Abstract></Article></MedlineCitation></PubmedArticle>")
        t, a = extract_article_fields(xml)
        # ElementTree returns None for an empty element's text
        assert (t or "") == title
        assert (a or "") == abstract

    @given(st.text(max_size=120))
    @settings(max_examples=100, deadline=None)
    def test_never_raises_on_garbage(self, junk):
        from saber_spark.kernels.text import extract_article_fields
        out = extract_article_fields(junk)
        assert isinstance(out, tuple) and len(out) == 2


class TestRenderProperties:
    spans = st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 20), labels).map(
            lambda t: {"start": t[0], "end": t[0] + t[1], "label": t[2]}),
        max_size=8)

    @given(st.text(min_size=0, max_size=60).filter(lambda s: "<" not in s
                                                   and ">" not in s
                                                   and "&" not in s),
           spans)
    @settings(max_examples=200, deadline=None)
    def test_all_text_preserved_in_order(self, text, mentions):
        """Stripping the markup from the rendered HTML yields exactly the
        original text (no characters lost or duplicated by span slicing),
        for any overlap pattern."""
        import html as html_mod
        import re
        from saber_spark.visualize import render_document_html
        ms = [m for m in mentions if m["end"] <= len(text)]
        html = render_document_html(text, ms)
        stripped = html_mod.unescape(re.sub(r"<[^>]+>", "", html))
        # remove the label badges the renderer appends inside each mark
        for m in ms:
            stripped = stripped.replace(m["label"], "", 1)
        assert stripped == text


class TestPackingInvariants:
    """pack_sequences is window arithmetic over a running count — its
    invariants must hold for ANY token-count multiset, not just fixtures.
    Spark-free check of the same math via a reference reimplementation;
    the Spark formulation is pinned by test_operators.TestSequencePacking
    and the sequence_packing DuckDB oracle."""

    @given(st.lists(st.integers(min_value=1, max_value=50),
                    min_size=1, max_size=60),
           st.integers(min_value=1, max_value=64))
    @settings(max_examples=200, deadline=None)
    def test_offsets_bounded_and_contiguous(self, counts, window):
        cum = 0
        prev_end = 0
        for n in counts:
            bin_id, bin_offset = cum // window, cum % window
            assert 0 <= bin_offset < window
            # the packed stream is gapless: this doc starts exactly where
            # the previous one ended
            assert bin_id * window + bin_offset == prev_end
            prev_end = bin_id * window + bin_offset + n
            cum += n
        assert cum == sum(counts)
