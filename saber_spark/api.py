"""The reference's flagship entry point, rebuilt: ``annotate(text)``.

Saber's primary UX is one call — ``Saber.annotate(text, title=..., coref=...,
ground=...)`` returning ``{'text', 'title', 'ents'}`` with per-entity
``{'start','end','text','label'}`` plus optional ``'xrefs'``
(saber/saber.py:52-128; xref attachment saber/utils/grounding_utils.py:53-66;
multi-model fan-out saber/cli/app.py:60-85). This module gives a user
switching from the reference the SAME call shape, driver-side, built from
the identical kernels the Spark stages run — so one-document annotate and
the 10^12-row pipeline produce consistent results by construction.

For corpus-scale work use ``saber_spark.pipeline.run_pipeline``; this is the
interactive/debug/serving surface (the REST analogue O28 is
``python -m saber_spark.api 'some text'``).
"""

from __future__ import annotations

import json
import sys

from saber_spark.fixtures.dictionary import GROUNDING_DICT_ROWS, surface_label_map
from saber_spark.kernels.chunk import chunk_entities
from saber_spark.kernels.text import extract_html_text, process_text, sterilize
from saber_spark.operators.tagger import DictionaryTagger

DEFAULT_ENTITIES = {"PRGE": True, "DISO": True, "CHED": True, "LIVB": True}


def _xref_index() -> dict[tuple[str, str], list[dict]]:
    """(surface, label) -> [{namespace, id[, organism-id]}] — exact-surface
    keying per the reference (grounding_utils.py:65-66)."""
    idx: dict[tuple[str, str], list[dict]] = {}
    for surface, label, namespace, xid, organism, _canonical in GROUNDING_DICT_ROWS:
        xref = {"namespace": namespace, "id": xid}
        if organism is not None:
            xref["organism-id"] = organism
        idx.setdefault((surface, label), []).append(xref)
    return idx


def annotate(text: str | bytes | None = None, title: str = "",
             html: bytes | None = None, ents: dict[str, bool] | None = None,
             coref: bool = False, ground: bool = False,
             tagger: DictionaryTagger | None = None) -> dict:
    """One document -> annotation dict (reference schema).

    Mirrors Saber.annotate: validate -> sterilize (or HTML-extract) ->
    sentence/token split -> tag -> BIO chunk -> char spans -> optional
    grounding xrefs. ``ents`` filters labels like the multi-model fan-out
    (app_utils.py:117-142: absent => off). Raises ValueError on empty input
    like the reference (saber/saber.py:83-86).
    """
    if text is None and html is None:
        raise ValueError("One of `text` or `html` must be provided.")
    if text is not None and not isinstance(text, str):
        raise ValueError(f"Expected `text` to be a str. Got: {type(text)}")
    doc_text = sterilize(text) if text is not None else extract_html_text(html)
    if not doc_text:
        raise ValueError("Expected a non-empty document.")

    # NOT `ents or ...`: an explicit empty dict means "no types enabled"
    # (absent => off, app_utils.py:117-142), not "use the defaults"
    enabled = {k for k, v in
               (ents if ents is not None else DEFAULT_ENTITIES).items() if v}
    if tagger is None:
        tagger = DictionaryTagger(surface_label_map())
    if coref:
        from saber_spark.operators.coref import resolve_text
        doc_text = resolve_text(doc_text, tagger.surface_map)

    sents, offsets = process_text(doc_text)
    entities: list[dict] = []
    for tokens, offs in zip(sents, offsets):
        tags = tagger.predict_tags([tokens])[0]
        for label, i, j in chunk_entities(tags):
            if label not in enabled:
                continue
            start, end = offs[i][0], offs[j - 1][1]
            entities.append({"start": start, "end": end,
                             "text": doc_text[start:end], "label": label})

    annotation = {"text": doc_text, "title": title, "ents": entities}
    if ground:
        idx = _xref_index()
        for ent in annotation["ents"]:
            xrefs = idx.get((ent["text"], ent["label"]))
            if xrefs:
                ent["xrefs"] = xrefs
    return annotation


def main() -> None:
    """CLI twin of the reference's /annotate/text route (saber/cli/app.py:23-39):
    ``python -m saber_spark.api 'raw text' [--ground]`` -> one JSON line."""
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    if not args:
        print(json.dumps({"error": "usage: python -m saber_spark.api "
                                   "'text to annotate' [--ground] [--coref]"}))
        raise SystemExit(2)
    print(json.dumps(annotate(" ".join(args), ground="--ground" in flags,
                              coref="--coref" in flags)))


if __name__ == "__main__":
    main()
