"""As-of (point-in-time) join — a temporal operator Spark lacks natively.

For every left row, attach the most recent right row whose timestamp is <=
the left timestamp, per partition key (the financial/telemetry "last known
value" join; DuckDB/Pandas expose it as ASOF JOIN / merge_asof).

Spark-first formulation, ONE shuffle, no range-join blowup: union the two
sides with a side tag, window over (keys) ordered by (ts, side), and carry
the latest right payload forward with last(..., ignoreNulls=True). Right
rows sort before left rows at equal timestamps, giving the inclusive (>=)
ASOF semantics. At 10^12 rows this is exactly a sessionize-shaped plan: one
Exchange on the key, one sort, one window — no per-row Python, no
O(left x right) candidate pairs like a naive range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, keys: list[str],
              ts_col: str, payload_cols: list[str],
              prefix: str = "asof_") -> DataFrame:
    """left rows + the latest right payload at-or-before each left row.

    ``payload_cols``: right columns to carry (emitted as ``prefix+name``,
    NULL when no right row precedes). ``ts_col`` must be present on both
    sides and totally ordered within (keys, side) — add a tiebreak column to
    the sort if your right side can repeat timestamps within a key.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(*keys, ts_col, *payload_cols) \
        .withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in keys + [ts_col] and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in payload_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    unioned = l.unionByName(r)

    w = (Window.partitionBy(*keys)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last(
        F.when(F.col("_side") == 0,
               F.struct(*[F.col(c) for c in payload_cols])),
        ignorenulls=True).over(w)
    out = unioned.withColumn("_carry", carried).filter(F.col("_side") == 1)
    for c in payload_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("_carry")[c])
    return out.select(*lcols, *[f"{prefix}{c}" for c in payload_cols])
