"""Canonical StructType schemas for the trace data model.

Design stance (SURVEY.md §7.1): schemas are FIXED StructTypes. Tags and
processes are ``MapType`` — never dynamic per-key columns — because an
unbounded schema width is hostile to Catalyst plan caching and to 100 TB
scale. The reference's dynamic 11+N tag pivot
(``/root/reference/traceframe/traceframe.py:465-467``) is reproduced on
demand as a *presentation* helper (:func:`traceframe_spark.operators.spans.with_tag_columns`).

Timestamp discipline (SURVEY.md §7.4): raw span times stay **int64
microseconds since epoch** (``startTime``/``duration``), exactly as Jaeger
emits them and as the critical-path kernel requires for exact integer
arithmetic. The traces table converts to ``TimestampType`` /
``DayTimeIntervalType`` at the boundary, mirroring the reference's
datetime64/timedelta64 columns (``traceframe.py:194,206``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# One Jaeger tag: {key, type, value}. ``type`` ∈ {string, int64, bool,
# float64}; ``value`` is read as its JSON literal text ("true", "42", ...).
TAG_TYPE = StructType(
    [
        StructField("key", StringType()),
        StructField("type", StringType()),
        StructField("value", StringType()),
    ]
)

# A span-to-span reference, e.g. {refType: "CHILD_OF", traceID, spanID}.
REFERENCE_TYPE = StructType(
    [
        StructField("refType", StringType()),
        StructField("traceID", StringType()),
        StructField("spanID", StringType()),
    ]
)

# One process entry in trace.processes: {serviceName, tags}.
PROCESS_TYPE = StructType(
    [
        StructField("serviceName", StringType()),
        StructField("tags", ArrayType(TAG_TYPE)),
    ]
)

# A raw Jaeger span as nested inside a trace document
# (shape enumerated at reference traceframe.py:460-467).
RAW_SPAN_TYPE = StructType(
    [
        StructField("traceID", StringType()),
        StructField("spanID", StringType()),
        StructField("flags", LongType()),
        StructField("operationName", StringType()),
        StructField("references", ArrayType(REFERENCE_TYPE)),
        StructField("startTime", LongType()),  # µs since epoch
        StructField("duration", LongType()),  # µs
        StructField("tags", ArrayType(TAG_TYPE)),
        StructField("logs", ArrayType(StringType())),
        StructField("processID", StringType()),
        StructField("warnings", ArrayType(StringType())),
    ]
)

# A raw Jaeger trace document (consumed at reference traceframe.py:255-258):
# {traceID, spans: [...], processes: {pid -> process}, warnings}.
RAW_TRACE_SCHEMA = StructType(
    [
        StructField("traceID", StringType()),
        StructField("spans", ArrayType(RAW_SPAN_TYPE)),
        StructField("processes", MapType(StringType(), PROCESS_TYPE)),
        StructField("warnings", ArrayType(StringType())),
    ]
)

# Canonical span table: 11 fixed columns + tags as MapType
# (reference builds 11 fixed + one column per tag key, traceframe.py:485-495).
SPAN_SCHEMA = StructType(
    [
        StructField("traceID", StringType()),
        StructField("spanID", StringType()),
        StructField("flags", LongType()),
        StructField("operationName", StringType()),
        StructField("startTime", LongType()),  # µs since epoch (raw units)
        StructField("duration", LongType()),  # µs
        StructField("logs", ArrayType(StringType())),
        StructField("processID", StringType()),
        StructField("warnings", ArrayType(StringType())),
        StructField("service", StringType()),
        StructField("parent", StringType()),  # "" = root
        StructField("tags", MapType(StringType(), StringType())),
    ]
)

# Traces table: 8 columns (reference process_traces, traceframe.py:209-230).
# duration/startTime become interval/timestamp here; see module docstring.
TRACE_COLUMNS = [
    "traceID",
    "traceName",
    "nspans",
    "errspans",
    "duration",
    "startTime",
    "processes",
    "iserror",
]

# Output of the critical-path kernel: one row per critical segment,
# ordered by seg_index within a trace. Carries the full span payload the
# reference embeds in each CritSeg (test_traceframe.py:8-81).
CRITSEG_SCHEMA = StructType(
    [
        StructField("traceID", StringType()),
        StructField("seg_index", IntegerType()),
        StructField("seg_start", LongType()),  # µs since epoch
        StructField("seg_duration", LongType()),  # µs
        StructField("spanID", StringType()),
        StructField("operationName", StringType()),
        StructField("span_start", LongType()),
        StructField("span_duration", LongType()),
        StructField("processID", StringType()),
        StructField("parent", StringType()),
        StructField("service", StringType()),
    ]
)
