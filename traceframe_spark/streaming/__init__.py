"""Structured Streaming over a live span feed.

The reference is batch-only (its nearest streaming analogue is the
recursive fetch-window bisection, ``traceframe.py:107-136``). This module
is the planned extension from SURVEY.md §2.D: a span feed consumed as an
unbounded table with

- :func:`read_span_stream` — file/directory source of span JSONL
  (swap for Kafka by changing the reader, plans are identical),
- :func:`windowed_service_stats` — event-time windowed span/error rates
  with a watermark for late data,
- :func:`open_trace_assembly` — per-trace session state via
  ``applyInPandasWithState``: buffer spans per traceID, emit an
  assembled trace once the feed goes quiet for that trace (processing-
  time timeout), mirroring the batch traces table incrementally.
"""

from traceframe_spark.streaming.manifest_store import (
    read_manifest_store,
    stream_to_hll_manifest,
    stream_to_rollup_manifest,
    vacuum_manifest_store,
)
from traceframe_spark.streaming.spans import (
    open_trace_assembly,
    read_span_stream,
    stream_to_span_store,
    streaming_dedup,
    windowed_service_stats,
)

__all__ = [
    "read_span_stream",
    "windowed_service_stats",
    "open_trace_assembly",
    "stream_to_span_store",
    "streaming_dedup",
    "stream_to_rollup_manifest",
    "stream_to_hll_manifest",
    "read_manifest_store",
    "vacuum_manifest_store",
]
