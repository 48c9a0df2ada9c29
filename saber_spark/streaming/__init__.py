"""Structured Streaming stages (streaming twins of the batch operators)."""

from saber_spark.streaming.stream import (
    start_incremental_curation,
    stream_cms_grid,
    stream_dedup_events,
    stream_funnel,
    stream_mentions,
    stream_sessionize,
    stream_windowed_counts,
)

__all__ = ["start_incremental_curation", "stream_cms_grid",
           "stream_dedup_events", "stream_funnel", "stream_mentions",
           "stream_sessionize", "stream_windowed_counts"]
