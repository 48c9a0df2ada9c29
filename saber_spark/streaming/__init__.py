"""Structured Streaming stages (streaming twins of the batch operators)."""

from saber_spark.streaming.stream import (
    stream_dedup_events,
    stream_funnel,
    stream_mentions,
    stream_sessionize,
    stream_windowed_counts,
)

__all__ = ["stream_dedup_events", "stream_funnel", "stream_mentions",
           "stream_sessionize", "stream_windowed_counts"]
