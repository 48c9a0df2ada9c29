"""Optional coreference resolution stage (O5).

Reference behavior: when ``coref=True``, neuralcoref rewrites the document
so every coreferent mention is replaced by its main referent, and the
pipeline re-tokenizes the resolved text (saber/preprocessor.py:54-57;
semantics documented at docs/quick_start.md:101-120 — "Every pronoun ...
replaced with its referent"). Off by default in the reference; same here.

The neural model is unbuildable in this sandbox, so the stage ships a
DETERMINISTIC resolver with the same contract (text -> resolved text,
applied before tagging): each pronoun is replaced by the surface text of
the nearest PRECEDING dictionary mention whose label matches the pronoun's
class (it/this/that -> any non-person entity; he/she/they -> LIVB). A
neural resolver drops into ``resolve_text`` without touching the Spark
plan — the stage is one pandas UDF between extraction and tagging.
"""

from __future__ import annotations

import pandas as pd
from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from saber_spark.kernels.text import tokenize_with_offsets

# pronoun -> set of labels it may refer to (None = any label)
PRONOUN_CLASSES: dict[str, frozenset | None] = {
    "it": None, "this": None, "that": None,
    "they": frozenset({"LIVB"}), "he": frozenset({"LIVB"}),
    "she": frozenset({"LIVB"}),
}


def resolve_text(text: str, surface_map: dict[tuple[str, ...], str]) -> str:
    """Replace pronouns with the nearest preceding entity mention surface.

    Deterministic single pass, longest-match mention detection (the same
    matcher the tagger uses) so resolved output re-tokenizes consistently.
    """
    toks = tokenize_with_offsets(text)
    tokens = [t for t, _, _ in toks]
    max_len = max((len(k) for k in surface_map), default=1)
    # forward scan: remember last mention per label, rewrite pronouns
    out_parts: list[str] = []
    last_by_label: dict[str, str] = {}
    last_any: str | None = None
    cursor = 0
    i = 0
    while i < len(tokens):
        matched = 0
        for length in range(min(max_len, len(tokens) - i), 0, -1):
            label = surface_map.get(tuple(tokens[i:i + length]))
            if label is not None:
                start, end = toks[i][1], toks[i + length - 1][2]
                surface = text[start:end]
                last_by_label[label] = surface
                last_any = surface
                matched = length
                break
        if matched:
            i += matched
            continue
        tok, start, end = toks[i]
        classes = PRONOUN_CLASSES.get(tok.lower(), "absent")
        if classes != "absent":
            referent = None
            if classes is None:
                referent = last_any
            else:
                for lab in classes:
                    if lab in last_by_label:
                        referent = last_by_label[lab]
                        break
            if referent is not None:
                out_parts.append(text[cursor:start])
                out_parts.append(referent)
                cursor = end
        i += 1
    out_parts.append(text[cursor:])
    return "".join(out_parts)


def resolve_coreferences(extracted: DataFrame,
                         surface_map_bc: Broadcast) -> DataFrame:
    """(url, doc_text) -> same schema with pronouns resolved (pandas UDF)."""

    @pandas_udf(StringType())
    def _resolve(texts: pd.Series) -> pd.Series:
        smap = surface_map_bc.value
        return texts.map(lambda t: resolve_text(t, smap) if t else t)

    return extracted.withColumn("doc_text", _resolve(F.col("doc_text")))
