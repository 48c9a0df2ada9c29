"""Structured Streaming: incremental KG construction + windowed analytics.

The reference is a batch annotator with a REST front-end
(saber/cli/app.py:17-95); its streaming analogue in this rebuild is
"annotate pages as they arrive": readStream over a page directory ->
the SAME extraction + tagging stages (mapInPandas works unchanged on
streaming DataFrames) -> append-mode parquet mentions sink.

Windowed twins of the batch analytics:
  stream_windowed_counts  watermark + tumbling window groupBy
  stream_sessionize       session_window (gap-based), the streaming
                          equivalent of operators/sessions.sessionize

Scale notes: watermarks bound state (late data beyond 10 min is dropped);
session state is per (user, window) and expires with the watermark, so a
10^12-event stream holds only the active-session frontier in memory.
"""

from __future__ import annotations

from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from saber_spark.operators.extract import extract_text
from saber_spark.operators.tagger import detect_mentions


def stream_mentions(pages_stream: DataFrame,
                    surface_map_bc: Broadcast) -> DataFrame:
    """Streaming pages -> streaming mentions (same stages as batch)."""
    return detect_mentions(extract_text(pages_stream), surface_map_bc)


def stream_windowed_counts(events_stream: DataFrame,
                           window: str = "1 hour",
                           watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window event counts with a watermark for late data."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("total_value"))
        .select(F.col("win.start").alias("window_start"),
                "event_type", "n_events", "total_value")
    )


def stream_sessionize(events_stream: DataFrame,
                      gap: str = "30 minutes",
                      watermark: str = "10 minutes") -> DataFrame:
    """Gap-based session aggregation (streaming twin of sessionize)."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("total_value"))
        .select("user_id", F.col("win.start").alias("session_start"),
                F.col("win.end").alias("session_end"), "n_events",
                "total_value")
    )
