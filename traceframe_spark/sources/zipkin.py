"""Zipkin v2 JSON trace source.

The reference ingests Jaeger and Elasticsearch only
(`/root/reference/traceframe/traceframe.py:233-327`); Zipkin is the
other widespread open trace format, so a drop-in engine should read it.
The mapping follows the PUBLIC Zipkin v2 span model (zipkin-api
OpenAPI: ``ListOfSpans``, the POST /api/v2/spans payload — also the
shape of Zipkin's own JSON file dumps):

- ``traceId`` / ``id`` / ``parentId`` hex strings → ``traceID`` /
  ``spanID`` / ``parent`` (lowercased; Zipkin tolerates mixed case and
  64/128-bit ids; absent parent → root);
- ``name`` → ``operationName``; ``timestamp``/``duration`` are already
  int64 **µs** (the engine-wide raw unit — no conversion);
- ``tags`` is already a string map → the Jaeger TAG_TYPE array for the
  regroup path (every value typed ``string``, which is what Zipkin
  guarantees); the Zipkin ``error`` tag convention lines up with the
  reference's error-tag detection (`traceframe.py:177-183`) unchanged;
- ``localEndpoint.serviceName`` → the service / process identity
  (process tags carry ipv4/port when present); ``annotations`` →
  ``logs`` as JSON strings; ``debug`` → ``flags`` (1 like Jaeger's
  debug flag bit), ``kind`` becomes a ``span.kind`` tag (Jaeger's own
  convention for it);
- ``shared=true`` spans (the server half of an RPC reusing the client
  span's id) are disambiguated in the spirit of Jaeger's Zipkin
  receiver: the shared half gets a SYNTHETIC 16-hex spanID —
  ``substr(md5(id # serviceName # ipv4 # port # timestamp), 1, 16)`` —
  and the original ``<id>`` (the client half) as its parent, so a dump
  carrying both halves yields unique spanIDs and a correct
  parent/child edge instead of double-counting in regroup /
  critical-path kernels keyed on spanID. Hashing the endpoint AND the
  start timestamp into the id (rather than a fixed ``-s`` suffix)
  keeps ids unique even when a dump carries TWO shared halves for one
  id (multi-hop proxies, duplicated server records from distinct
  endpoints, or the same server recording the span twice at different
  instants), and preserves the 16-hex spanID shape downstream
  consumers assume. FORMAT DEVIATION: the synthetic id is not Zipkin's
  original id — consumers that join back to the raw dump should key on
  (traceId, parent, endpoint, timestamp). Shared records agreeing on
  (id, endpoint, timestamp) still collide by design — at microsecond
  start-time resolution such records describe the same observation, so
  collapsing them is the deduplication this mapping exists to provide.
  If the client half is absent from the
  dump the shared span is an orphan (parent points at a missing id) —
  same as Jaeger.

One ``spark.read.json`` with an explicit schema plus native
explode/projection — distributed, pruned, zero Python row logic; the
traces table reuses the ES regroup (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from traceframe_spark.sources.es import regroup_spans_to_traces

_ENDPOINT = StructType(
    [
        StructField("serviceName", StringType()),
        StructField("ipv4", StringType()),
        StructField("ipv6", StringType()),
        StructField("port", LongType()),
    ]
)

_ANNOTATION = StructType(
    [StructField("timestamp", LongType()), StructField("value", StringType())]
)

ZIPKIN_SPAN_SCHEMA = StructType(
    [
        StructField("traceId", StringType()),
        StructField("id", StringType()),
        StructField("parentId", StringType()),
        StructField("name", StringType()),
        StructField("kind", StringType()),
        StructField("timestamp", LongType()),
        StructField("duration", LongType()),
        StructField("debug", BooleanType()),
        StructField("shared", BooleanType()),
        StructField("localEndpoint", _ENDPOINT),
        StructField("remoteEndpoint", _ENDPOINT),
        StructField("annotations", ArrayType(_ANNOTATION)),
        StructField("tags", MapType(StringType(), StringType())),
    ]
)


def read_raw_zipkin(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Zipkin v2 JSON file(s) → one row per span. ``multiline=True``
    reads the ``[ {span}, ... ]`` array form (API payloads / UI dumps);
    ``multiline=False`` reads span-per-line JSONL with line-parallel
    splits."""
    # multiLine mode turns a root-level JSON array into one row per
    # element, so both file shapes share the one element schema
    return spark.read.json(path, schema=ZIPKIN_SPAN_SCHEMA, multiLine=multiline)


def _typed_tags(tags: Column, kind: Column) -> Column:
    """Zipkin's string map → Jaeger TAG_TYPE array; ``kind`` rides along
    as the ``span.kind`` tag (Jaeger's convention), lowercased."""
    base = F.map_entries(F.coalesce(tags, F.create_map().cast("map<string,string>")))
    arr = F.transform(
        base,
        lambda e: F.struct(
            e["key"].alias("key"), F.lit("string").alias("type"), e["value"].alias("value")
        ),
    )
    kind_tag = F.struct(
        F.lit("span.kind").alias("key"),
        F.lit("string").alias("type"),
        F.lower(kind).alias("value"),
    )
    return F.when(kind.isNotNull(), F.concat(arr, F.array(kind_tag))).otherwise(arr)


def zipkin_raw_spans(raw: DataFrame) -> DataFrame:
    """Flat Zipkin spans → the regroup input shape (Jaeger-style
    references/tags + a process struct). Pure projection — no
    shuffle."""
    shared = F.coalesce(F.col("shared"), F.lit(False))
    # shared server half: synthetic 16-hex id unique PER HALF (endpoint
    # and start timestamp hashed in, so two shared halves of one id stay
    # distinct — even same-endpoint re-records at different instants —
    # and the spanID keeps its 16-hex shape), parented on the client half
    ep0 = F.col("localEndpoint")
    shared_id = F.substring(
        F.md5(
            F.concat_ws(
                "#",
                F.lower("id"),
                F.coalesce(ep0["serviceName"], F.lit("")),
                F.coalesce(ep0["ipv4"], F.lit("")),
                F.coalesce(ep0["port"].cast("string"), F.lit("")),
                F.coalesce(F.col("timestamp").cast("string"), F.lit("")),
            )
        ),
        1,
        16,
    )
    span_id = F.when(shared, shared_id).otherwise(F.lower("id"))
    parent = F.when(shared, F.lower("id")).otherwise(
        F.coalesce(F.lower("parentId"), F.lit(""))
    )
    ep = F.col("localEndpoint")
    proc_tags = F.filter(
        F.array(
            F.struct(
                F.lit("ipv4").alias("key"),
                F.lit("string").alias("type"),
                ep["ipv4"].alias("value"),
            ),
            F.struct(
                F.lit("ipv6").alias("key"),
                F.lit("string").alias("type"),
                ep["ipv6"].alias("value"),
            ),
            F.struct(
                F.lit("port").alias("key"),
                F.lit("int64").alias("type"),
                ep["port"].cast("string").alias("value"),
            ),
        ),
        lambda t: t["value"].isNotNull(),
    )
    return raw.select(
        F.lower("traceId").alias("traceID"),
        span_id.alias("spanID"),
        F.when(F.coalesce(F.col("debug"), F.lit(False)), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flags"),
        F.coalesce(F.col("name"), F.lit("")).alias("operationName"),
        F.when(
            parent != "",
            F.array(
                F.struct(
                    F.lit("CHILD_OF").alias("refType"),
                    F.lower("traceId").alias("traceID"),
                    parent.alias("spanID"),
                )
            ),
        )
        .otherwise(
            F.array().cast("array<struct<refType:string,traceID:string,spanID:string>>")
        )
        .alias("references"),
        F.col("timestamp").alias("startTime"),
        F.coalesce(F.col("duration"), F.lit(0)).alias("duration"),
        _typed_tags(F.col("tags"), F.col("kind")).alias("tags"),
        F.transform(F.col("annotations"), lambda a: F.to_json(a)).alias("logs"),
        F.struct(
            F.coalesce(ep["serviceName"], F.lit("unknown")).alias("serviceName"),
            proc_tags.alias("tags"),
        ).alias("process"),
    )


def _canonical_spans(s: DataFrame) -> DataFrame:
    """Flattened Zipkin spans → canonical SPAN_SCHEMA projection
    (stateless select — shared by batch and streaming readers)."""
    pid = F.concat_ws(":", F.lit("zipkin"), F.col("process.serviceName"))
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


def spans_from_zipkin_file(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """Canonical span table (SPAN_SCHEMA: 11 fixed cols + tags map) from
    a Zipkin v2 JSON dump — the Zipkin twin of
    ``spans_from_jaeger_file``. Zero-shuffle: explode + projection."""
    return _canonical_spans(
        zipkin_raw_spans(read_raw_zipkin(spark, path, multiline=multiline))
    )


def span_stream_from_zipkin(
    spark: SparkSession, path: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """Unbounded canonical span table from a directory of span-per-line
    Zipkin JSON files. Stateless flatten — composes with every
    downstream streaming operator unchanged."""
    raw = (
        spark.readStream.schema(ZIPKIN_SPAN_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
    return _canonical_spans(zipkin_raw_spans(raw))


def traces_from_zipkin_file(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """Traces table (8 cols) from a Zipkin v2 dump: flatten, regroup per
    trace (one shuffle), then the standard trace aggregation. Process
    identity keys on the endpoint ipv4 (Zipkin's host analogue) +
    service name."""
    from traceframe_spark.operators.traces import traces_table

    raw_spans = zipkin_raw_spans(read_raw_zipkin(spark, path, multiline=multiline))
    return traces_table(regroup_spans_to_traces(raw_spans, process_name_key="ipv4"))
