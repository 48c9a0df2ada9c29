"""Grouped-map statistics via applyInPandas (the grouped Arrow API).

Demonstrates the third Python-boundary shape (pandas_udf = columnar scalar,
mapInPandas = partition stream, applyInPandas = one pandas frame per GROUP)
on an operator whose semantics are also expressible relationally — so the
DuckDB oracle cross-checks the Arrow path against pure window SQL.

Scale note: applyInPandas shuffles on the group key and materializes ONE
group per pandas frame — only safe when single-group size is bounded (here:
docs per source). For unbounded groups use window functions instead; this
module exists to cover the API and to verify the two paths agree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ZSCORE_SCHEMA = "doc_id long, source string, n_chars long, zscore double"


def zscore_by_group(docs: DataFrame, group_col: str = "source",
                    value_col: str = "n_chars") -> DataFrame:
    """Per-group z-score of a value column (population stddev).

    -> (doc_id, source, n_chars, zscore rounded 6); groups with zero
    variance emit zscore = 0.0.
    """

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf[value_col].mean()
        std = pdf[value_col].std(ddof=0)  # population, matches stddev_pop
        z = ((pdf[value_col] - mean) / std) if std > 0 else 0.0
        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "source": pdf[group_col],
            "n_chars": pdf[value_col],
            "zscore": (z if std > 0 else pd.Series(0.0, index=pdf.index)
                       ).round(6),
        })

    return docs.select("doc_id", group_col, value_col).groupBy(
        group_col).applyInPandas(score, schema=ZSCORE_SCHEMA)


def mad_outliers(df: DataFrame, value_col: str, group_col: str = "source",
                 threshold: float = 3.5) -> DataFrame:
    """Robust per-group outlier profile via median absolute deviation ->
    (group, median_val, mad, n_rows, n_outliers, outlier_rate).

    zscore_by_group's robust sibling: mean/stddev are themselves dragged
    by the outliers they are supposed to flag, so curation pipelines use
    the modified z-score M = 0.6745*|x - median| / MAD and flag |M| >
    3.5 (Iglewicz & Hoaglin 1993, "How to Detect and Handle Outliers").
    A boilerplate page 40x longer than its host's median moves the MAD
    barely at all — exactly why web-corpus length filters use this form.

    MAD = median(|x - median(x)|). Degenerate MAD = 0 (over half the
    group identical) is DEFINED: no finite threshold, so n_outliers = 0.

    Exactness: percentile() is the exact sort-based variant (DuckDB twin
    quantile_cont); the flag compares 0.6745*absdev against
    threshold*mad — both sides exact-input doubles with one
    multiplication each, no division, so the boundary is engine-portable
    (and rates are counts/count, rounded to 6, not float sums).

    Scale shape: two grouped percentile aggs (sort within group — for
    the 100-TB path swap percentile for approx_percentile, same plan
    shape) + one broadcast-eligible join of the |groups|-sized stats
    back to the rows + one final grouped count agg.
    """
    x = F.col(value_col).cast("double")
    med = (df.groupBy(group_col)
           .agg(F.expr(f"percentile({value_col}, 0.5)").alias("median_val"),
                F.count(F.lit(1)).alias("n_rows")))
    with_dev = (df.join(F.broadcast(med), group_col)
                .withColumn("absdev", F.abs(x - F.col("median_val"))))
    mad = (with_dev.groupBy(group_col, "median_val", "n_rows")
           .agg(F.expr("percentile(absdev, 0.5)").alias("mad")))
    flagged = (with_dev.join(
        F.broadcast(mad.select(group_col, "mad")), group_col)
        .withColumn("is_outlier",
                    (F.col("mad") > 0)
                    & (F.lit(0.6745) * F.col("absdev")
                       > F.lit(threshold) * F.col("mad"))))
    agg = (flagged.groupBy(group_col)
           .agg(F.sum(F.col("is_outlier").cast("long")).alias("n_outliers")))
    return (mad.join(agg, group_col)
            .select(group_col, "median_val", "mad", "n_rows",
                    F.col("n_outliers").cast("long").alias("n_outliers"),
                    F.round(F.col("n_outliers").cast("double")
                            / F.col("n_rows"), 6).alias("outlier_rate")))


def gini_concentration(df: DataFrame, group_col: str, key_col: str
                       ) -> DataFrame:
    """Gini coefficient of per-key mass within each group — the
    concentration diagnostic a corpus/KG pipeline runs before trusting
    aggregate counts (one hub entity holding 90% of a label's mentions
    means the label's statistics are really that entity's; same for one
    host dominating a source). Computed from the sorted-rank identity

        G = (2 * sum(i * x_(i))) / (n * sum(x)) - (n + 1) / n

    with x ascending, i = 1..n — exact integer sums feeding one double
    expression (the edge_pmi portability convention), no pair joins.

    Scale shape: one (group, key) hash agg (map-side combinable), one
    rank window per group over the ALREADY-reduced key counts, one
    final agg. n = distinct keys per group, so the window input is
    key-cardinality-sized, never row-sized.

    -> (group, n_keys, total, gini 6dp) — gini 0 = uniform, -> 1 =
    concentrated; single-key groups are 0 by the identity.
    """
    counts = (df.groupBy(F.col(group_col).alias("grp"),
                         F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("x")))
    w = Window.partitionBy("grp").orderBy(F.col("x").asc(),
                                          F.col("key").asc())
    ranked = counts.withColumn("i", F.row_number().over(w))
    return (ranked.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("x").alias("total"),
                 F.sum(F.col("i") * F.col("x")).alias("ix"))
            .select(F.col("grp").alias(group_col),
                    "n_keys", "total",
                    F.round(
                        2.0 * F.col("ix").cast("double") /
                        (F.col("n_keys") * F.col("total")).cast("double")
                        - (F.col("n_keys") + 1).cast("double") /
                        F.col("n_keys").cast("double"), 6).alias("gini")))
