"""Text kernels: sterilize, NERsuite tokenization, offsets, sentences, HTML.

Behavioral parity targets (reference = /root/reference, BaderLab/saber):
  - sterilize:   saber/preprocessor.py:259-277  (strip + collapse \\s+ -> ' ')
  - tokenizer:   saber/utils/text_utils.py:10-17 (NERsuite-style: alnum runs
                 are single tokens, every other non-space char is its own
                 token; golden values saber/tests/test_text_utils.py:18-67)
  - offsets:     saber/preprocessor.py:76-99 (per-token (start, end) char
                 offsets into the sterilized text; golden values
                 saber/tests/test_preprocessor.py:23-36)
  - sentences:   reference uses spaCy (saber/preprocessor.py:52); the rebuild
                 uses an equivalent deterministic rule (split after [.!?]
                 followed by whitespace) so results are oracle-checkable.

These functions are pure Python + ``re`` only. They run byte-identically on
the driver (reference harness) and inside Arrow pandas UDFs on executors —
that is what makes the "byte-identical extracted text per url" invariant
testable.
"""

from __future__ import annotations

import re

# NERsuite-like tokenization: alnum runs preserved as single tokens, every
# other character its own token. Same language as the reference's INFIX_RE
# (saber/utils/text_utils.py:10) after spaCy's whitespace pre-splitting: we
# fold the whitespace handling into the pattern by excluding \s.
INFIX_PATTERN = r"[0-9a-zA-Z]+|[^0-9a-zA-Z\s]"
_TOKEN_RE = re.compile(INFIX_PATTERN)

_WS_RE = re.compile(r"\s+")

# Sentence boundary: one or more of .!? followed by whitespace. Applied to
# sterilized text (single spaces), so the lookahead is a single ' '.
_SENT_BOUNDARY_RE = re.compile(r"(?<=[.!?])\s+")

# Minimal deterministic HTML -> text: drop script/style blocks, strip tags,
# unescape the five predefined entities, then sterilize. Self-contained (no
# bs4) so the output can never drift with a library version.
_SCRIPT_STYLE_RE = re.compile(
    r"<\s*(script|style)\b[^>]*>.*?<\s*/\s*\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_ENTITY_MAP = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITY_MAP))


def sterilize(text: str, lower: bool = False) -> str:
    """Strip leading/trailing whitespace and collapse \\s+ runs to one space.

    Parity: saber/preprocessor.py:274 (``re.sub(r'\\s+', ' ', text.strip())``).
    This is the byte-identity anchor for the extraction invariant.
    """
    out = _WS_RE.sub(" ", text.strip())
    return out.lower() if lower else out


def extract_html_text(html: bytes | str) -> str:
    """Deterministic HTML -> sterilized text extraction.

    Generalizes the reference's text-entry path (raw text in
    saber/saber.py:52-96; PubMed XML field extraction in
    saber/utils/app_utils.py:19-80) to web pages. The final normalization is
    exactly ``sterilize`` so the per-url byte-identity invariant holds.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    no_scripts = _SCRIPT_STYLE_RE.sub(" ", html)
    no_tags = _TAG_RE.sub(" ", no_scripts)
    unescaped = _ENTITY_RE.sub(lambda m: _ENTITY_MAP[m.group(0)], no_tags)
    return sterilize(unescaped)


def tokenize(text: str) -> list[str]:
    """NERsuite-style tokenization.

    Golden parity with saber/tests/test_text_utils.py:18-67, e.g.
    ``"This test's tokenizers ... 3X, more/or/less."`` ->
    ``['This', 'test', "'", 's', ..., '3X', ',', 'more', '/', 'or', ...]``.
    """
    return _TOKEN_RE.findall(text)


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """Tokens with (start, end) char offsets into ``text``.

    Parity: saber/preprocessor.py:93-97 — end offsets are exclusive
    (token = text[start:end]); golden saber/tests/test_preprocessor.py:27-36.
    """
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """(start, end) char spans of sentences in sterilized ``text``.

    Deterministic stand-in for spaCy ``doc.sents``
    (saber/preprocessor.py:90-99): a sentence ends after [.!?] followed by
    whitespace, or at end-of-text. Empty text -> no spans.
    """
    if not text:
        return []
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _SENT_BOUNDARY_RE.finditer(text):
        spans.append((start, m.start()))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    return spans


def extract_article_fields(xml: str | bytes | None) -> tuple[str | None, str | None]:
    """(title, abstract) from a PubMed-article-shaped XML string.

    Hermetic parity with the PARSING half of the reference's PubMed fetch
    (saber/utils/app_utils.py:63-80: recurse PubmedArticle > MedlineCitation
    > Article to ArticleTitle / Abstract > AbstractText) — the network fetch
    itself is out of scope (SURVEY §2.1 O17); this kernel runs over a LOCAL
    xml column. Missing elements -> None (the reference would raise; a 100 TB
    corpus treats malformed rows as data, not exceptions).
    """
    if xml is None:
        return None, None
    if isinstance(xml, (bytes, bytearray)):
        xml = bytes(xml).decode("utf-8", errors="replace")
    import xml.etree.ElementTree as ET
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return None, None
    art = root.find("./PubmedArticle/MedlineCitation/Article")
    if art is None:
        # allow the PubmedArticle element itself as root
        art = root.find("./MedlineCitation/Article")
    if art is None:
        return None, None
    title_el = art.find("ArticleTitle")
    abs_el = art.find("Abstract/AbstractText")
    return (title_el.text if title_el is not None else None,
            abs_el.text if abs_el is not None else None)


def process_text(text: str) -> tuple[list[list[str]], list[list[tuple[int, int]]]]:
    """Sentences-of-tokens plus per-token global char offsets.

    Parity: saber/preprocessor.py:76-99 (``_process_text``); golden
    saber/tests/test_preprocessor.py:23-36:
    ``"Simple example. With two sentences!"`` ->
    ``([['Simple','example','.'], ['With','two','sentences','!']],
       [[(0,6),(7,14),(14,15)], [(16,20),(21,24),(25,34),(34,35)]])``.
    """
    sents: list[list[str]] = []
    offsets: list[list[tuple[int, int]]] = []
    for s_start, s_end in sentence_spans(text):
        toks = tokenize_with_offsets(text[s_start:s_end])
        if not toks:
            continue
        sents.append([t for t, _, _ in toks])
        offsets.append([(s_start + a, s_start + b) for _, a, b in toks])
    return sents, offsets
