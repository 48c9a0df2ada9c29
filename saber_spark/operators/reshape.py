"""Pivot / unpivot reshaping (wide <-> long), DataFrame-native.

Reference basis: the reference renders per-document annotation summaries by
entity type (saber/cli/app.py fan-out unions, README's per-type counts); an
analytics engine needs the general reshape pair. The pivot here is the
explicit-values form: passing the category list skips Spark's
distinct-value pre-pass JOB and keeps the output schema static — the only
shape that is sane at 100 TB (an implicit pivot would scan the corpus once
just to learn the columns, and a high-cardinality pivot column would
explode the schema). Unpivot is the built-in `DataFrame.unpivot` (melt):
a narrow map, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_counts(df: DataFrame, group_col: str, pivot_col: str,
                 values: Sequence[str]) -> DataFrame:
    """group rows and spread ``pivot_col`` categories into count columns.

    -> (group_col, n_<v1>, ..., n_<vk>) with zero (not null) for empty
    cells. Compiled as conditional aggregation, NOT the built-in
    ``DataFrame.pivot``: Spark's pivot lowers to a pre-aggregation keyed
    on (group, pivot) plus a pivotfirst aggregation keyed on group — TWO
    exchanges — whereas count-if over the explicit category list is one
    partial+final hash agg on group_col (ONE exchange, map-side combined;
    verified in PLANS.md). Same result, half the shuffles.
    """
    return df.groupBy(group_col).agg(
        *[F.count(F.when(F.col(pivot_col) == v, 1)).alias(f"n_{v}")
          for v in values])


def unpivot_counts(df: DataFrame, id_col: str,
                   value_cols: Sequence[str], var_name: str = "key",
                   value_name: str = "n") -> DataFrame:
    """wide -> long: one row per (id, key) pair. Narrow (no shuffle)."""
    return df.unpivot(id_col, list(value_cols), var_name, value_name)
