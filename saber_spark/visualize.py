"""Entity visualization: deterministic displaCy-style HTML rendering (O27).

The reference renders annotations with spaCy displaCy in Jupyter
(saber/saber.py:124-126, per-label gradient colours saber/constants.py:8-16).
This module is the dependency-free twin: given a document's text and its
mention spans, emit a self-contained HTML snippet with one <mark> per entity
carrying the label badge — the same manual-ents contract displaCy's
``style='ent', manual=True`` consumes.

It is driver-side presentation (the reference gates it behind
``jupyter=True``); the batch path is ``render_mentions_df``, a pure
DataFrame aggregation that assembles the per-document HTML column with
built-in functions, so rendering a sample of a 10^12-row mentions table is
an ordinary distributed query + LIMIT, not a collect.
"""

from __future__ import annotations

from html import escape

# Parity: saber/constants.py:9-14 (same labels, same gradients).
COLOURS = {
    "PRGE": "linear-gradient(90deg, #aa9cfc, #fc9ce7)",
    "DISO": "linear-gradient(90deg, #ef9a9a, #f44336)",
    "CHED": "linear-gradient(90deg, #1DE9B6, #A7FFEB)",
    "LIVB": "linear-gradient(90deg, #FF4081, #F8BBD0)",
    "CL": "linear-gradient(90deg, #00E5FF, #84FFFF)",
}
_DEFAULT_COLOUR = "#ddd"

_MARK = ('<mark style="background: {colour}; padding: 0.2em;'
         ' border-radius: 0.35em;">{text}'
         '<span style="font-size: 0.8em; font-weight: bold;'
         ' margin-left: 0.3em;">{label}</span></mark>')


def render_document_html(text: str, mentions: list[dict]) -> str:
    """One document -> HTML string with entity <mark> spans.

    ``mentions``: dicts with 'start', 'end', 'label' (the annotation schema
    of saber/saber.py:108-112). Overlapping spans keep the earliest (then
    longest) — deterministic. Text is HTML-escaped; output is stable
    byte-for-byte for fixed input.
    """
    spans = sorted(mentions, key=lambda m: (m["start"], -m["end"]))
    out: list[str] = []
    cursor = 0
    for m in spans:
        s, e = m["start"], m["end"]
        if s < cursor:        # overlap with an already-rendered span
            continue
        out.append(escape(text[cursor:s]))
        out.append(_MARK.format(
            colour=COLOURS.get(m["label"], _DEFAULT_COLOUR),
            text=escape(text[s:e]), label=escape(m["label"])))
        cursor = e
    out.append(escape(text[cursor:]))
    return '<div class="entities">' + "".join(out) + "</div>"


def render_mentions_df(docs, mentions):
    """Distributed batch rendering: (url, doc_text) x mentions -> (url, html).

    Pure built-ins: mentions are sorted per document with array functions and
    the markup assembled by aggregate() — no Python in the loop, so this runs
    as an ordinary shuffle+agg at any corpus size (sample with LIMIT).
    """
    from pyspark.sql import functions as F

    # sort key (start ASC, end DESC): same-start overlaps must keep the
    # LONGEST span, matching render_document_html's (start, -end) ordering
    m = (mentions
         .groupBy("url")
         .agg(F.array_sort(F.collect_list(F.struct(
             F.col("start"), (-F.col("end")).alias("neg_end"),
             F.col("end"), F.col("label")))).alias("spans")))
    joined = docs.join(m, "url", "left")
    # fold spans left-to-right: state = struct(cursor, html). Offsets index
    # the UNESCAPED extracted text (markup already stripped by extract_text);
    # unlike the Python twin this path does not re-escape residual &<> —
    # escaping would shift the mention offsets.
    state0 = F.struct(F.lit(0).alias("cursor"), F.lit("").alias("html"))

    def step(acc, s):
        colour_s = F.coalesce(
            F.create_map(*[F.lit(x) for kv in COLOURS.items() for x in kv])[
                s["label"]], F.lit(_DEFAULT_COLOUR))
        gap = F.substring(
            F.col("doc_text"), acc["cursor"] + 1, s["start"] - acc["cursor"])
        mark = F.concat(
            F.lit('<mark style="background: '), colour_s,
            F.lit('; padding: 0.2em; border-radius: 0.35em;">'),
            F.substring(F.col("doc_text"), s["start"] + 1,
                        s["end"] - s["start"]),
            F.lit('<span style="font-size: 0.8em; font-weight: bold;'
                  ' margin-left: 0.3em;">'),
            s["label"], F.lit("</span></mark>"))
        skip = s["start"] < acc["cursor"]   # overlap -> keep earlier span
        return F.struct(
            F.when(skip, acc["cursor"]).otherwise(s["end"]).alias("cursor"),
            F.when(skip, acc["html"])
             .otherwise(F.concat(acc["html"], gap, mark)).alias("html"))

    folded = F.aggregate(F.coalesce(F.col("spans"),
                                    F.array().cast(
                                        "array<struct<start:int,neg_end:int,"
                                        "end:int,label:string>>")),
                         state0, step)
    tail = F.substring(F.col("doc_text"), folded["cursor"] + 1,
                       F.length("doc_text") - folded["cursor"])
    return joined.select(
        "url",
        F.concat(F.lit('<div class="entities">'), folded["html"], tail,
                 F.lit("</div>")).alias("html"))
