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
from pyspark.sql import DataFrame

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
