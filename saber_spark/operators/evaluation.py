"""Chunk-level evaluation (P/R/F1/support) as joins + aggregation.

Reference semantics (saber/metrics.py:124-201; kernel twin in
saber_spark.kernels.metrics): per-label TP/FP/FN by set membership of
(label, start, end) chunks under 'exact' / 'left' / 'right' boundary
criteria; labels enumerated from GOLD only; P=R=0 when TP=0.

Relational formulation (SURVEY.md §2.2):
  TP = gold INNER JOIN pred on the criteria columns
  FN = gold ANTI JOIN pred
  FP = pred ANTI JOIN gold (then restricted to labels present in gold)
  -> groupBy(label) + the P/R/F1 expressions.

Counting uses DISTINCT chunk identity within each side (the pipeline emits
chunk sets, matching the reference's set-membership checks on deduplicated
chunks). Micro avg = pooled counts; macro avg = unweighted mean per label —
derivable from this output; the driver-facing query emits per-label rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _criteria_cols(criteria: str, extra_keys: list[str]) -> list[str]:
    if criteria == "exact":
        return extra_keys + ["label", "chunk_start", "chunk_end"]
    if criteria == "left":
        return extra_keys + ["label", "chunk_start"]
    if criteria == "right":
        return extra_keys + ["label", "chunk_end"]
    raise ValueError(
        f"Expected criteria to be one of 'exact', 'left', or 'right'. Got: {criteria}")


def evaluate_chunks(gold: DataFrame, pred: DataFrame, criteria: str = "exact",
                    extra_keys: list[str] | None = None) -> DataFrame:
    """gold/pred (.., label, chunk_start, chunk_end) -> per-label metrics.

    Output: label, tp, fp, fn, precision, recall, f1 (rounded to 6 for
    engine-portable value comparison), ordered by label.
    """
    keys = _criteria_cols(criteria, extra_keys or [])
    g = gold.select(*keys).distinct()
    p = pred.select(*keys).distinct()

    tp = g.join(p, on=keys, how="inner").groupBy("label").agg(
        F.count(F.lit(1)).alias("tp"))
    fn = g.join(p, on=keys, how="left_anti").groupBy("label").agg(
        F.count(F.lit(1)).alias("fn"))
    fp = p.join(g, on=keys, how="left_anti").groupBy("label").agg(
        F.count(F.lit(1)).alias("fp"))

    labels = g.select("label").distinct()
    joined = (
        labels.join(tp, "label", "left")
        .join(fn, "label", "left")
        .join(fp, "label", "left")
        .na.fill(0, ["tp", "fn", "fp"])
    )
    prec = F.when(F.col("tp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    rec = F.when(F.col("tp") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    f1 = F.when((prec + rec) > 0,
                2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return joined.select(
        "label", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
