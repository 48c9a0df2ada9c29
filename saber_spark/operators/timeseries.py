"""Hypertable-style continuous aggregates: multi-granularity rollups where
each coarser level is computed FROM the next finer rollup, not from raw data.

The TimescaleDB pattern: the hour rollup scans the events once; the day
rollup aggregates the hour TABLE (thousands of rows per day instead of
millions of events), and so on up. At 10^12 events that reuse is the whole
point — raw data is touched exactly once per refresh regardless of how many
granularities are materialized. sum/count re-aggregate losslessly (avg is
derived as sum/count at read time; min/max also compose; true percentiles
need a sketch).

TZ-safety: bucket arithmetic on timezone-independent epoch microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.timeutil import epoch_micros as _epoch_micros

HOUR_US = 3_600_000_000
DAY_US = 24 * HOUR_US




def hypertable_rollup(events: DataFrame, ts_col: str = "ts",
                      key_col: str = "event_type", value_col: str = "value",
                      grains_us: list[tuple[str, int]] | None = None
                      ) -> DataFrame:
    """-> (grain, bucket_us, <key>, n_events, total_value), all grains
    unioned; grain g[i+1] aggregates the g[i] rollup (single raw scan).
    """
    grains = grains_us or [("hour", HOUR_US), ("day", DAY_US)]
    us = _epoch_micros(ts_col)
    finest_name, finest_us = grains[0]
    level = (events
             .select((F.floor(us / finest_us) * finest_us).alias("bucket_us"),
                     F.col(key_col),
                     F.col(value_col).cast("decimal(18,2)").alias("_v"))
             .groupBy("bucket_us", key_col)
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("_v").alias("_total")))
    out = level.select(F.lit(finest_name).alias("grain"), "bucket_us",
                       key_col, "n_events",
                       F.col("_total").cast("double").alias("total_value"))
    for name, width in grains[1:]:
        # coarser level from the finer ROLLUP: counts sum, sums sum
        level = (level
                 .select((F.floor(F.col("bucket_us") / width) * width)
                         .alias("bucket_us"),
                         key_col, "n_events", "_total")
                 .groupBy("bucket_us", key_col)
                 .agg(F.sum("n_events").alias("n_events"),
                      F.sum("_total").alias("_total")))
        out = out.unionByName(level.select(
            F.lit(name).alias("grain"), "bucket_us", key_col, "n_events",
            F.col("_total").cast("double").alias("total_value")))
    return out
