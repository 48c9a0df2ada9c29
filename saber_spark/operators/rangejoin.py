"""Banded (binned) range join — interval joins without the O(n·m) blowup.

A naive time-range join (right.ts BETWEEN left.ts+lo AND left.ts+hi) compiles
to a conditional join that degenerates to per-key nested loops. The standard
scale formulation bins both sides by a bucket the width of the window: each
left row lands in the <=2 consecutive bins its window can touch, the join is
an EQUI-join on (keys, bin), and the exact predicate filters the residue.
Candidate count per left row is bounded by the rows in two bins — linear in
data density, never quadratic in partition size.

TZ-safety: timestamps are TIMESTAMP_NTZ; all arithmetic runs on
timezone-independent epoch microseconds (timestamp_diff vs a fixed ntz
epoch), matching DuckDB's epoch_us on naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.timeutil import epoch_micros as _epoch_micros




def range_join(left: DataFrame, right: DataFrame, keys: list[str],
               ts_col: str, lower_us: int, upper_us: int,
               payload_cols: list[str], prefix: str = "r_") -> DataFrame:
    """Pairs (left row, right payload) with right.ts in
    [left.ts + lower_us, left.ts + upper_us], per key.

    Inner-join semantics (unmatched left rows drop; aggregate with a later
    left join against ``left`` if zeros are needed).
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must exceed lower_us")
    bin_us = upper_us - lower_us
    lcols = left.columns

    l = left.withColumn("_us", _epoch_micros(ts_col)).withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor((F.col("_us") + lower_us) / bin_us),
            F.floor((F.col("_us") + upper_us) / bin_us))))
    r = (right.select(*keys, ts_col, *payload_cols)
         .withColumn("_rus", _epoch_micros(ts_col))
         .withColumn("_bin", F.floor(F.col("_rus") / bin_us))
         .drop(ts_col)
         .select(*keys, "_bin", "_rus",
                 *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols]))

    out = (l.join(r, on=keys + ["_bin"])
           .filter((F.col("_rus") >= F.col("_us") + lower_us)
                   & (F.col("_rus") <= F.col("_us") + upper_us)))
    return out.select(*lcols, *[f"{prefix}{c}" for c in payload_cols])
