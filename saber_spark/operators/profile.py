"""One-pass table profiling: per-column null/distinct/min/max statistics.

The ANALYZE-shape every engine ships (and the first thing a data-quality
pass runs over a new crawl drop). Implemented as a single wide-to-long
``stack`` (narrow, JVM codegen) followed by ONE grouped aggregation —
profiling K columns costs one shuffle, not K scans of the table.

Values are compared AS STRINGS (cast before the aggregation) so min/max
are well-defined across mixed types and engine-portable; numeric columns
meant for numeric min/max should be profiled by a numeric agg instead.

Scale: count(DISTINCT value) is exact here (two-phase distinct aggregate —
Spark plans an Expand + partial/final, still one logical pass); at 100 TB
swap ``exact_distinct=False`` to use approx_count_distinct (HLL sketch,
mergeable, no second shuffle) — the column stays named n_distinct and the
oracle check is then rows-only by design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str],
                  exact_distinct: bool = True) -> DataFrame:
    """-> (column_name, n_rows, n_nonnull, n_distinct, min_value, max_value)
    one row per profiled column; *_value are strings (NULLs excluded from
    distinct/min/max, counted via n_rows - n_nonnull)."""
    for c in columns:
        # names are interpolated into a generated stack() expression; a
        # quote/backtick would break out of (or silently re-pair) it
        if "'" in c or "`" in c:
            raise ValueError(f"profile_table: column name {c!r} may not "
                             "contain quotes or backticks")
    pairs = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in columns)
    stacked = df.select(
        F.expr(f"stack({len(columns)}, {pairs}) as (column_name, value)"))
    n_distinct = (F.count_distinct(F.col("value")) if exact_distinct
                  else F.approx_count_distinct("value"))
    return (stacked.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_nonnull"),
        n_distinct.alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ))
