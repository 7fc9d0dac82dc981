"""OTLP/JSON trace file source (OpenTelemetry Protocol).

The reference ingests Jaeger and Elasticsearch only
(`/root/reference/traceframe/traceframe.py:233-327`); modern collectors
export OTLP, so a drop-in engine needs this path. The mapping follows
the PUBLIC OTLP spec (opentelemetry-proto `trace.proto` +
ExportTraceServiceRequest) and the protobuf-JSON encoding rules:

- ``ExportTraceServiceRequest = {resourceSpans: [{resource, scopeSpans:
  [{scope, spans: [...]}]}]}``;
- 64-bit integers (``startTimeUnixNano``/``endTimeUnixNano``/
  ``intValue``) serialize as DECIMAL STRINGS in JSON — the schema reads
  them as strings and casts;
- enums may appear numeric (``2``) or symbolic
  (``"STATUS_CODE_ERROR"``) — both are handled.

Canonical mapping (onto `schemas.SPAN_SCHEMA` / the regroup path):

- ``traceId``/``spanId``/``parentSpanId`` hex strings → ``traceID`` /
  ``spanID`` / ``parent`` (lowercased; absent parent → ``""``);
- ``name`` → ``operationName``; nano times → int64 **µs** start +
  duration (the engine-wide raw unit, SURVEY.md §7.4);
- span ``attributes`` → the tags map; an error ``status`` additionally
  sets ``tags['error'] = 'true'`` so the reference's error-tag
  detection (`traceframe.py:177-183`) works unchanged on OTLP data;
- resource ``attributes`` → the process entry: ``service.name`` is the
  service (per the OTel semantic conventions), every resource attribute
  becomes a process tag; span ``events`` → ``logs`` as JSON strings.

Everything is one `spark.read.json` with an explicit schema plus native
explode/projection — distributed, pruned, zero Python row logic; the
traces table reuses the ES regroup (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from traceframe_spark.sources.es import regroup_spans_to_traces

# protobuf-JSON AnyValue: exactly one of the value fields is present.
# kvlist/array values are kept as nested JSON via their raw struct.
_ANY_VALUE = StructType(
    [
        StructField("stringValue", StringType()),
        StructField("boolValue", StringType()),  # JSON true/false reads as string
        StructField("intValue", StringType()),  # int64 → decimal string
        StructField("doubleValue", StringType()),
        StructField("bytesValue", StringType()),
        StructField(
            "arrayValue",
            StructType([StructField("values", ArrayType(StringType()))]),
        ),
    ]
)

_KEY_VALUE = StructType(
    [StructField("key", StringType()), StructField("value", _ANY_VALUE)]
)

_EVENT = StructType(
    [
        StructField("timeUnixNano", StringType()),
        StructField("name", StringType()),
        StructField("attributes", ArrayType(_KEY_VALUE)),
    ]
)

_STATUS = StructType(
    [StructField("message", StringType()), StructField("code", StringType())]
)

_OTLP_SPAN = StructType(
    [
        StructField("traceId", StringType()),
        StructField("spanId", StringType()),
        StructField("parentSpanId", StringType()),
        StructField("name", StringType()),
        StructField("kind", StringType()),
        StructField("flags", LongType()),
        StructField("startTimeUnixNano", StringType()),
        StructField("endTimeUnixNano", StringType()),
        StructField("attributes", ArrayType(_KEY_VALUE)),
        StructField("events", ArrayType(_EVENT)),
        StructField("status", _STATUS),
    ]
)

OTLP_EXPORT_SCHEMA = StructType(
    [
        StructField(
            "resourceSpans",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "resource",
                            StructType(
                                [StructField("attributes", ArrayType(_KEY_VALUE))]
                            ),
                        ),
                        StructField(
                            "scopeSpans",
                            ArrayType(
                                StructType(
                                    [
                                        StructField(
                                            "scope",
                                            StructType(
                                                [StructField("name", StringType())]
                                            ),
                                        ),
                                        StructField("spans", ArrayType(_OTLP_SPAN)),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _any_value_str(v: Column) -> Column:
    """AnyValue → its string rendering (protobuf JSON keeps int64 as a
    string already; bools arrive as JSON true/false)."""
    return F.coalesce(
        v["stringValue"],
        v["intValue"],
        v["boolValue"],
        v["doubleValue"],
        v["bytesValue"],
        F.to_json(v["arrayValue"]),
    )


def _any_value_type(v: Column) -> Column:
    """Jaeger-style tag type of an AnyValue (the TAG_TYPE ``type`` the
    rest of the engine understands)."""
    return (
        F.when(v["stringValue"].isNotNull(), F.lit("string"))
        .when(v["intValue"].isNotNull(), F.lit("int64"))
        .when(v["boolValue"].isNotNull(), F.lit("bool"))
        .when(v["doubleValue"].isNotNull(), F.lit("float64"))
        .otherwise(F.lit("string"))
    )


def _tags_array(attrs: Column) -> Column:
    """OTLP KeyValue list → Jaeger TAG_TYPE array (key, type, value)."""
    return F.transform(
        attrs,
        lambda kv: F.struct(
            kv["key"].alias("key"),
            _any_value_type(kv["value"]).alias("type"),
            _any_value_str(kv["value"]).alias("value"),
        ),
    )


def _error_tag() -> Column:
    # built lazily: classic-API Column construction needs an active session
    return F.struct(
        F.lit("error").alias("key"),
        F.lit("bool").alias("type"),
        F.lit("true").alias("value"),
    )


def read_raw_otlp(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """OTLP/JSON export file(s) → DataFrame[OTLP_EXPORT_SCHEMA], one row
    per ExportTraceServiceRequest document. ``multiline=False`` reads
    JSON-lines dumps (one request per line) with line-parallel splits."""
    return spark.read.json(path, schema=OTLP_EXPORT_SCHEMA, multiLine=multiline)


def otlp_raw_spans(raw: DataFrame) -> DataFrame:
    """Flatten OTLP documents to the regroup input shape: one row per
    span with Jaeger-style references/tags plus the resource-derived
    ``process`` struct. Pure explode/projection — no shuffle."""
    rs = raw.select(F.explode("resourceSpans").alias("rs"))
    sp = rs.select(
        F.col("rs.resource.attributes").alias("res_attrs"),
        F.explode("rs.scopeSpans").alias("ss"),
    ).select("res_attrs", F.explode("ss.spans").alias("s"))

    is_error = F.col("s.status.code").isin("2", "STATUS_CODE_ERROR")
    start_us = (F.col("s.startTimeUnixNano").cast("long") / 1000).cast("long")
    end_us = (F.col("s.endTimeUnixNano").cast("long") / 1000).cast("long")
    parent = F.coalesce(F.lower("s.parentSpanId"), F.lit(""))
    service = F.element_at(
        F.map_from_entries(
            F.transform(
                F.col("res_attrs"),
                lambda kv: F.struct(
                    kv["key"].alias("key"), _any_value_str(kv["value"]).alias("value")
                ),
            )
        ),
        "service.name",
    )

    return sp.select(
        F.lower("s.traceId").alias("traceID"),
        F.lower("s.spanId").alias("spanID"),
        F.coalesce(F.col("s.flags"), F.lit(0)).cast("long").alias("flags"),
        F.col("s.name").alias("operationName"),
        F.when(
            parent != "",
            F.array(
                F.struct(
                    F.lit("CHILD_OF").alias("refType"),
                    F.lower("s.traceId").alias("traceID"),
                    parent.alias("spanID"),
                )
            ),
        )
        .otherwise(F.array().cast("array<struct<refType:string,traceID:string,spanID:string>>"))
        .alias("references"),
        start_us.alias("startTime"),
        (end_us - start_us).alias("duration"),
        F.when(
            is_error,
            F.concat(_tags_array(F.col("s.attributes")), F.array(_error_tag())),
        )
        .otherwise(_tags_array(F.col("s.attributes")))
        .alias("tags"),
        # single-arg lambda, NOT bare F.to_json: its optional ``options``
        # param makes transform treat it as the (element, index) form
        F.transform(F.col("s.events"), lambda e: F.to_json(e)).alias("logs"),
        F.struct(
            F.coalesce(service, F.lit("unknown")).alias("serviceName"),
            _tags_array(F.col("res_attrs")).alias("tags"),
        ).alias("process"),
    )


def _canonical_spans(s: DataFrame) -> DataFrame:
    """Flattened OTLP spans → canonical SPAN_SCHEMA projection (shared
    by the batch file reader and the streaming reader — identical
    semantics, and streaming-safe: stateless select only)."""
    pid = F.concat_ws(":", F.lit("otlp"), F.col("process.serviceName"))
    return s.select(
        "traceID",
        "spanID",
        "flags",
        "operationName",
        "startTime",
        "duration",
        "logs",
        pid.alias("processID"),
        F.lit(None).cast("array<string>").alias("warnings"),
        F.col("process.serviceName").alias("service"),
        F.coalesce(F.get(F.col("references"), 0)["spanID"], F.lit("")).alias("parent"),
        F.map_from_entries(
            F.transform(
                F.col("tags"),
                lambda t: F.struct(t["key"].alias("key"), t["value"].alias("value")),
            )
        ).alias("tags"),
    )


def spans_from_otlp_file(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """Canonical span table (SPAN_SCHEMA: 11 fixed cols + tags map) from
    an OTLP/JSON export — the OTLP twin of ``spans_from_jaeger_file``.
    Zero-shuffle: explode + projection only."""
    return _canonical_spans(otlp_raw_spans(read_raw_otlp(spark, path, multiline=multiline)))


def span_stream_from_otlp(
    spark: SparkSession, path: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """Unbounded canonical span table from a directory of OTLP/JSON-lines
    export files (one ExportTraceServiceRequest per line — the shape a
    collector file exporter rotates out). The flatten is stateless, so
    every downstream streaming operator (windowed stats, open-trace
    assembly, streaming dedup, span-store sink) composes unchanged."""
    raw = (
        spark.readStream.schema(OTLP_EXPORT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
    return _canonical_spans(otlp_raw_spans(raw))


def traces_from_otlp_file(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """Traces table (8 cols) from an OTLP/JSON export: flatten, regroup
    per trace (the one-shuffle ES path, keyed on the OTel
    ``service.name`` process identity), then the standard trace
    aggregation."""
    from traceframe_spark.operators.traces import traces_table

    raw_spans = otlp_raw_spans(read_raw_otlp(spark, path, multiline=multiline))
    return traces_table(regroup_spans_to_traces(raw_spans, process_name_key="host.name"))
