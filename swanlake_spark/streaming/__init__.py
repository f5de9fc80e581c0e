"""Structured Streaming extensions.

The reference has no streaming operators — its "rapid ingestion" story
is high-frequency appender INSERTs (SURVEY.md §2.6). Structured
Streaming is the idiomatic Spark upgrade path for that ingest side:
file-source streams → watermarked windowed aggregation → parquet/table
sinks, with exactly-once checkpointing.
"""

from swanlake_spark.streaming.funnel import funnel_stream
from swanlake_spark.streaming.matview import maintain_matview_stream
from swanlake_spark.streaming.sketch import (
    heavy_hitters_stream,
    histogram_stream,
    kmv_distinct_stream,
    read_candidates,
    read_histogram,
    read_kmv,
)
from swanlake_spark.streaming.retention import retention_stream
from swanlake_spark.streaming.ingest import (
    session_stats_stream,
    sessionize,
    stream_events_from_directory,
    streaming_append_to_table,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = [
    "funnel_stream",
    "heavy_hitters_stream",
    "histogram_stream",
    "kmv_distinct_stream",
    "maintain_matview_stream",
    "read_candidates",
    "read_histogram",
    "read_kmv",
    "retention_stream",
    "session_stats_stream",
    "sessionize",
    "stream_events_from_directory",
    "streaming_append_to_table",
    "streaming_dedup",
    "windowed_event_counts",
]
