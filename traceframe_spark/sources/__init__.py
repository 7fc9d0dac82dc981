"""Data sources: Jaeger JSON files, the Jaeger HTTP API, Elasticsearch,
OTLP/JSON exports, and Zipkin v2 JSON dumps."""

from traceframe_spark.sources.jaeger_file import read_raw_traces, spans_from_jaeger_file, traces_from_jaeger_file
from traceframe_spark.sources.jaeger_http import (
    fetch_traces_partitioned,
    get_traces,
    known_services,
    raw_traces_from_jaeger,
)
from traceframe_spark.sources.es import regroup_spans_to_traces, spans_from_es
from traceframe_spark.sources.otlp import spans_from_otlp_file, traces_from_otlp_file
from traceframe_spark.sources.zipkin import spans_from_zipkin_file, traces_from_zipkin_file

__all__ = [
    "read_raw_traces",
    "spans_from_jaeger_file",
    "traces_from_jaeger_file",
    "fetch_traces_partitioned",
    "get_traces",
    "known_services",
    "raw_traces_from_jaeger",
    "regroup_spans_to_traces",
    "spans_from_es",
    "spans_from_otlp_file",
    "traces_from_otlp_file",
    "spans_from_zipkin_file",
    "traces_from_zipkin_file",
]
