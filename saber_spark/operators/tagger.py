"""Mention detection: batched sequence tagging via mapInPandas.

Reference behavior chain being reimplemented (saber/saber.py:93-112):
  transform (sentences+offsets, preprocessor.py:26-99) -> model.predict in
  batches of 256 (saber.py:97-99, constants.py:60) -> idx->tag decode
  (saber.py:101) -> chunk_entities (preprocessor.py:195-227) -> char-span
  assembly (saber.py:104-112).

Architecture: the *model* is pluggable — anything implementing
``predict_tags(list[list[str]]) -> list[list[str]]`` (token sequences in,
BIO/BIOES tag sequences out, the exact interface of the reference's
BiLSTM-CRF + decode). The default model is ``DictionaryTagger`` — a
deterministic greedy longest-match tagger over the broadcast grounding
surfaces (the sandbox stand-in for the neural net per SURVEY.md §7.3; the
Keras/TF stack is intentionally NOT a dependency). A real model drops in by
replacing ``make_model`` without touching the Spark plan.

Scale notes:
  - mapInPandas -> narrow stage, no shuffle; the caller repartitions on
    hash(url) beforehand for uniform work distribution (north_rule).
  - per-executor model caching: the model is constructed once per Python
    worker from the broadcast payload (reference analogue: models preloaded
    at server start, saber/cli/app.py:93) and reused across Arrow batches.
  - internal re-batching to PRED_BATCH_SIZE sentences mirrors the
    reference's fixed 256-sentence predict batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame

from saber_spark.kernels.chunk import chunk_entities
from saber_spark.kernels.text import process_text

PRED_BATCH_SIZE = 256  # parity: /root/reference/saber/constants.py:60

MENTIONS_SCHEMA = (
    "url string, sent_id int, tok_start int, tok_end int, "
    "start int, end int, text string, label string"
)


class DictionaryTagger:
    """Greedy longest-match BIO tagger over a (token-tuple -> label) dict.

    Deterministic stand-in for the BiLSTM-CRF
    (saber/models/multi_task_lstm_crf.py:56-145): same interface — token
    sequences in, BIO tag sequences out.
    """

    def __init__(self, surface_map: dict[tuple[str, ...], str]):
        self.surface_map = surface_map
        self.max_len = max((len(k) for k in surface_map), default=1)
        # hot-loop layout: single-token surfaces get a direct dict; longer
        # surfaces are grouped by length (desc) behind a first-token gate so
        # the common case (no match) costs ONE dict probe per token instead
        # of max_len tuple allocations — this loop runs once per token of
        # the whole corpus inside the mapInPandas stage
        self._singles: dict[str, str] = {}
        by_len: dict[int, dict[tuple[str, ...], str]] = {}
        for key, label in surface_map.items():
            if len(key) == 1:
                self._singles[key[0]] = label
            else:
                by_len.setdefault(len(key), {})[key] = label
        self._multis = [
            (length, d, {k[0] for k in d})
            for length, d in sorted(by_len.items(), reverse=True)
        ]
        # precomputed tag strings (avoid per-hit f-string formatting)
        labels = set(surface_map.values())
        self._b = {lab: f"B-{lab}" for lab in labels}
        self._i = {lab: f"I-{lab}" for lab in labels}

    def predict_tags(self, sentences: list[list[str]]) -> list[list[str]]:
        singles, multis = self._singles, self._multis
        b_tag, i_tag = self._b, self._i
        out = []
        for tokens in sentences:
            n = len(tokens)
            tags = ["O"] * n
            i = 0
            while i < n:
                t = tokens[i]
                label = None
                length = 1
                for mlen, d, firsts in multis:  # longest first
                    if t in firsts and i + mlen <= n:
                        label = d.get(tuple(tokens[i:i + mlen]))
                        if label is not None:
                            length = mlen
                            break
                if label is None:
                    label = singles.get(t)
                if label is None:
                    i += 1
                    continue
                tags[i] = b_tag[label]
                for j in range(i + 1, i + length):
                    tags[j] = i_tag[label]
                i += length
            out.append(tags)
        return out


# Per-Python-worker model cache (the "load once per executor" pattern;
# reference analogue saber/saber.py:76-81 lazy init).
_MODEL_CACHE: dict[int, object] = {}


def _build_model(payload):
    """Model factory from a broadcast payload.

    Two payload shapes:
      {(token,...): label, ...}                         -> DictionaryTagger
      {"kind": "viterbi", "surface_map": ..., "word_to_idx": ...}
                                                        -> ViterbiCRFTagger
    A trained neural model slots in as another "kind" without touching the
    Spark plan (the mapInPandas stage is model-agnostic).
    """
    if hasattr(payload, "predict_tags"):
        return payload  # a ready model (e.g. a trained ViterbiCRFTagger)
    if isinstance(payload, dict) and payload.get("kind") == "viterbi":
        from saber_spark.models import ViterbiCRFTagger

        weights = payload.get("weights")
        if weights is not None:
            # fully-fitted artifact (train.py --model-dir): restore the
            # trained matrices instead of re-deriving from the dictionary
            return ViterbiCRFTagger(
                payload["word_to_idx"], payload["config"]["tags"],
                weights["emissions"], weights["transitions"])
        return ViterbiCRFTagger.from_dictionary(
            payload["surface_map"], payload["word_to_idx"])
    return DictionaryTagger(payload)


def _get_model(payload):
    key = id(payload)
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = _build_model(payload)
        _MODEL_CACHE.clear()
        _MODEL_CACHE[key] = model
    return model


def _tag_documents(urls: list[str], texts: list[str],
                   model: DictionaryTagger) -> list[tuple]:
    """Reference pipeline order: process -> batch-predict -> chunk -> spans."""
    # 1. preprocess all docs, remembering (doc, sent) provenance
    sent_tokens: list[list[str]] = []
    sent_meta: list[tuple[str, int, list[tuple[int, int]], str]] = []
    for url, text in zip(urls, texts):
        sents, offsets = process_text(text)
        for sid, (toks, offs) in enumerate(zip(sents, offsets)):
            sent_tokens.append(toks)
            sent_meta.append((url, sid, offs, text))
    # 2. predict in fixed-size batches (parity with PRED_BATCH_SIZE=256)
    rows: list[tuple] = []
    for b in range(0, len(sent_tokens), PRED_BATCH_SIZE):
        batch = sent_tokens[b:b + PRED_BATCH_SIZE]
        tag_seqs = model.predict_tags(batch)
        for (url, sid, offs, text), toks, tags in zip(
                sent_meta[b:b + PRED_BATCH_SIZE], batch, tag_seqs):
            # 3. chunk + 4. char-span assembly (saber/saber.py:102-112)
            for label, i, j in chunk_entities(tags):
                start, end = offs[i][0], offs[j - 1][1]
                rows.append((url, sid, i, j, start, end, text[start:end], label))
    return rows


def detect_mentions(extracted: DataFrame,
                    surface_map_bc: Broadcast) -> DataFrame:
    """(url, doc_text) -> mentions(url, sent_id, tok/char spans, text, label)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model(surface_map_bc.value)
        cols = ["url", "sent_id", "tok_start", "tok_end",
                "start", "end", "text", "label"]
        for pdf in batches:
            rows = _tag_documents(pdf["url"].tolist(),
                                  pdf["doc_text"].tolist(), model)
            yield pd.DataFrame(rows, columns=cols)

    return extracted.select("url", "doc_text").mapInPandas(
        run, schema=MENTIONS_SCHEMA)
