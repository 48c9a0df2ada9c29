"""Driver-side reference implementation of the full annotate->triples path.

This is the eval oracle for the P/R >= 0.95 gate (BASELINE.md): it reruns
the reference *pipeline semantics* — sterilize -> tokenize/sents ->
tag -> chunk -> exact-surface link -> within-sentence pairing — as plain
row-by-row Python over the same input rows, using ONLY the pure kernels and
independent loop logic (no Spark operator code), mirroring how
Saber.annotate walks one document at a time (saber/saber.py:52-128).

The tagger model is shared with the Spark path by design: the reference's
neural net is replaced by the same deterministic DictionaryTagger on both
sides (SURVEY.md §7.3), so the comparison isolates the DATAFLOW REBUILD —
partitioning, batching, joins, aggregation — which is exactly what the gate
is meant to verify.
"""

from __future__ import annotations

from saber_spark.kernels.chunk import chunk_entities
from saber_spark.kernels.text import extract_html_text, process_text, sterilize
from saber_spark.operators.tagger import DictionaryTagger


def annotate_document(url: str, text: str | None, html: bytes | None,
                      tagger: DictionaryTagger,
                      canonical_map: dict[tuple[str, str], str]) -> list[dict]:
    """One document -> list of grounded mention dicts (reference semantics)."""
    doc_text = sterilize(text) if text is not None else extract_html_text(html)
    if not doc_text:
        return []
    sents, offsets = process_text(doc_text)
    mentions = []
    for sid, (tokens, offs) in enumerate(zip(sents, offsets)):
        tags = tagger.predict_tags([tokens])[0]
        for label, i, j in chunk_entities(tags):
            start, end = offs[i][0], offs[j - 1][1]
            surface = doc_text[start:end]
            mentions.append({
                "url": url, "sent_id": sid, "start": start, "end": end,
                "text": surface, "label": label,
                "canonical_id": canonical_map.get((surface, label)),
            })
    return mentions


def reference_triples(rows: list[tuple], tagger: DictionaryTagger,
                      canonical_map: dict[tuple[str, str], str]
                      ) -> set[tuple[str, str, str, str, int]]:
    """rows of (url, text, html) -> {(subj, pred, obj, url, sent_id)}."""
    triples: set[tuple[str, str, str, str, int]] = set()
    for url, text, html in rows:
        mentions = annotate_document(url, text, html, tagger, canonical_map)
        by_sent: dict[int, set[str]] = {}
        for m in mentions:
            if m["canonical_id"] is not None:
                by_sent.setdefault(m["sent_id"], set()).add(m["canonical_id"])
        for sid, ents in by_sent.items():
            ordered = sorted(ents)
            for a in range(len(ordered)):
                for b in range(a + 1, len(ordered)):
                    triples.add((ordered[a], "cooccurs_with", ordered[b],
                                 url, sid))
    return triples


def triple_precision_recall(
    predicted: set[tuple], gold: set[tuple]
) -> tuple[float, float]:
    if not predicted or not gold:
        return 0.0, 0.0
    tp = len(predicted & gold)
    return tp / len(predicted), tp / len(gold)
