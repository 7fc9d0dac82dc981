"""Data sources: Jaeger JSON files, the Jaeger HTTP API, Elasticsearch."""

from traceframe_spark.sources.jaeger_file import read_raw_traces, spans_from_jaeger_file, traces_from_jaeger_file

__all__ = [
    "read_raw_traces",
    "spans_from_jaeger_file",
    "traces_from_jaeger_file",
]
