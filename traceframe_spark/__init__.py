"""traceframe_spark — a PySpark-native trace-analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the hindfoot/traceframe reference library (distributed traces → data
frames), re-expressed Spark-first: declarative DataFrame plans, fixed
StructType schemas, one Arrow-exchanged grouped-map kernel (critical
path), and large-scale data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) built for 100 TB inputs.
"""

from traceframe_spark.session import get_spark
from traceframe_spark.schemas import (
    CRITSEG_SCHEMA,
    RAW_TRACE_SCHEMA,
    SPAN_SCHEMA,
    TRACE_COLUMNS,
)
from traceframe_spark.sources import (
    read_raw_traces,
    spans_from_jaeger_file,
    traces_from_jaeger_file,
)
from traceframe_spark.operators import (
    critical_path_segments,
    spans_table,
    traces_table,
    with_tag_columns,
)
from traceframe_spark.operators.assemble import trace_with_spans
from traceframe_spark.operators.analytics import (
    critical_path_breakdown,
    operation_stats,
    service_dependencies,
)
from traceframe_spark import sinks, viz
from traceframe_spark.operators.critical_path import critical_segments_of_trace
from traceframe_spark.operators.search import search_traces
from traceframe_spark.sources.jaeger_datasource import JaegerDataSource

# training-data pipeline surface (module handles: tfs.dedup.minhash_..., etc.)
from traceframe_spark.operators import (  # noqa: F401
    bpe,
    dedup,
    graph,
    multimodal,
    profile,
    rollup,
    sampling,
    similarity,
    sketch,
    skew,
    text,
)
from traceframe_spark.sources.jsonl import read_jsonl_quarantined, spans_from_jsonl

__all__ = [
    "get_spark",
    "CRITSEG_SCHEMA",
    "RAW_TRACE_SCHEMA",
    "SPAN_SCHEMA",
    "TRACE_COLUMNS",
    "read_raw_traces",
    "spans_from_jaeger_file",
    "traces_from_jaeger_file",
    "critical_path_segments",
    "critical_segments_of_trace",
    "spans_table",
    "traces_table",
    "with_tag_columns",
    "trace_with_spans",
    "service_dependencies",
    "operation_stats",
    "critical_path_breakdown",
    "search_traces",
    "JaegerDataSource",
    "sinks",
    "viz",
    "bpe",
    "dedup",
    "graph",
    "multimodal",
    "profile",
    "rollup",
    "sampling",
    "similarity",
    "sketch",
    "skew",
    "text",
    "read_jsonl_quarantined",
    "spans_from_jsonl",
]

__version__ = "0.1.0"
