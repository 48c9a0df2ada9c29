"""Shared timezone-safety helper for every temporal operator.

events.ts is TIMESTAMP_NTZ; casting it or extracting calendar fields is
session-timezone-dependent and breaks engine parity under a non-UTC driver.
The ONE safe primitive is microseconds-since-epoch via timestamp_diff
against a fixed ntz epoch — integer, timezone-free, equal to DuckDB's
epoch_us on naive timestamps. Every operator that does timestamp arithmetic
(sessions, range join, hypertable rollup) must use this helper, not a copy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(ts_col: str) -> Column:
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col(ts_col))
