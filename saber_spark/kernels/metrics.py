"""Chunk-level precision / recall / F1 / support.

Behavioral parity with the reference evaluation
(saber/metrics.py:124-201 and saber/utils/model_utils.py:186-206):
  - per-label TP/FP/FN by set membership of (label, start, end) chunks;
  - ``criteria``: 'exact' (both boundaries), 'left' (start only),
    'right' (end only) — column slicing per saber/metrics.py:158-166;
  - labels enumerated from the GOLD chunks only (a predicted-only label
    contributes nothing, matching the reference);
  - MACRO_AVG = unweighted mean over labels, support = pooled TP+FN;
  - MICRO_AVG = P/R/F1 from pooled TP/FP/FN counts;
  - precision/recall are 0.0 when TP == 0 (reference convention).

Deviation note: the reference uses plain list membership
(saber/metrics.py:174-184), which double-counts duplicated chunks
asymmetrically (each gold duplicate tests membership independently). The
pipeline only ever emits de-duplicated chunk sets, where list and set
semantics coincide — including every golden in the reference's own tests —
so we normalize to SET semantics after criteria projection. This is also
what makes the relational (join-based) formulation in
operators/evaluation.py exactly equivalent.
"""

from __future__ import annotations


def precision_recall_f1_support(
    tp: int, fp: int, fn: int
) -> tuple[float, float, float, int]:
    """(precision, recall, f1, support) from TP/FP/FN counts.

    Parity: saber/utils/model_utils.py:186-206 (0.0 when TP == 0).
    """
    precision = tp / (tp + fp) if tp > 0 else 0.0
    recall = tp / (tp + fn) if tp > 0 else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) > 0 else 0.0
    return precision, recall, f1, tp + fn


def _project(chunk: tuple, criteria: str) -> tuple:
    if criteria == "exact":
        return chunk
    if criteria == "left":
        return chunk[:2]
    if criteria == "right":
        return (chunk[0],) + tuple(chunk[2:])
    raise ValueError(
        "Expected criteria to be one of 'exact', 'left', or 'right'. "
        f"Got: {criteria}"
    )


def get_precision_recall_f1_support(
    y_true: list[tuple], y_pred: list[tuple], criteria: str = "exact"
) -> dict[str, tuple[float, float, float, int]]:
    """Per-label scores plus MACRO_AVG / MICRO_AVG.

    Parity: saber/metrics.py:124-201.
    """
    if criteria not in ("exact", "left", "right"):
        raise ValueError(
            "Expected criteria to be one of 'exact', 'left', or 'right'. "
            f"Got: {criteria}"
        )
    scores: dict[str, tuple[float, float, float, int]] = {}
    labels = sorted({chunk[0] for chunk in y_true})
    tp_total = fp_total = fn_total = 0
    for lab in labels:
        gold = {_project(c, criteria) for c in y_true if c[0] == lab}
        pred = {_project(c, criteria) for c in y_pred if c[0] == lab}
        tp = len(gold & pred)
        fp = len(pred) - tp
        fn = len(gold) - tp
        scores[lab] = precision_recall_f1_support(tp, fp, fn)
        tp_total += tp
        fp_total += fp
        fn_total += fn
    if labels:
        macro_p = sum(v[0] for v in scores.values()) / len(labels)
        macro_r = sum(v[1] for v in scores.values()) / len(labels)
        macro_f1 = sum(v[2] for v in scores.values()) / len(labels)
    else:
        macro_p = macro_r = macro_f1 = 0.0
    scores["MACRO_AVG"] = (macro_p, macro_r, macro_f1, tp_total + fn_total)
    scores["MICRO_AVG"] = precision_recall_f1_support(tp_total, fp_total, fn_total)
    return scores
