"""Elasticsearch span source.

The reference scrolls ``jaeger-span-*`` indices through the ES client on
the driver (``/root/reference/traceframe/traceframe.py:331-402``: scroll
pages of ``min(10000, limit)``, 15 s keepalive, accumulate until the
limit is reached or a page comes back empty), then rebuilds traces with
a driver-side sort + group-break (``traceframe.py:277-309``).

Three tiers here, smallest-dependency first:

1. :func:`internal_spans_from_es` / :func:`traces_from_es` — the
   reference-parity driver-side scroll, written against an injectable
   ``transport`` (two callables) so it is testable without a server and
   swappable for the ``elasticsearch`` client, a pooled ``requests``
   session, or a fake. The default transport uses ``requests`` and the
   public ES scroll REST API — no ``elasticsearch`` package needed.
2. :func:`regroup_spans_to_traces` — the trace rebuild as one DataFrame
   aggregation (one shuffle), usable on any flat span table regardless
   of where it was read from.
3. :func:`spans_from_es` — the es-hadoop / elasticsearch-spark connector
   path, which partitions the scroll across executors natively; the
   right shape for bulk reads at 100 TB. Gated on the connector jar.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from traceframe_spark.schemas import PROCESS_TYPE, REFERENCE_TYPE, TAG_TYPE

ES_FORMAT = "org.elasticsearch.spark.sql"

# Keepalive + page-size caps, matching reference traceframe.py:352-353,373,382.
SCROLL_KEEPALIVE = "15s"
MAX_PAGE_SIZE = 10_000
DEFAULT_LIMIT = 2000

# A raw span document as stored in Jaeger's ES span index (the reference
# enumerates the keys at traceframe.py:279): like RAW_SPAN_TYPE but with
# the full ``process`` embedded per span instead of a processID.
ES_SPAN_SCHEMA = StructType(
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
        StructField("process", PROCESS_TYPE),
    ]
)

# transport = (search, scroll):
#   search(index: str, body: dict, scroll: str) -> ES response dict
#   scroll(scroll_id: str, scroll: str) -> ES response dict
SearchFn = Callable[[str, dict, str], dict]
ScrollFn = Callable[[str, str], dict]


def requests_transport(
    es_endpoint: str,
    es_password: str | None = None,
    es_user: str = "elastic",
    verify: bool = False,
    timeout: int = 45,
) -> tuple[SearchFn, ScrollFn]:
    """Default transport over the public ES scroll REST API.

    Replaces the reference's ``elasticsearch.Elasticsearch`` client
    (``traceframe.py:366-370``) with two thin ``requests`` calls — the
    ``elasticsearch`` package is not required. Auth follows the
    reference's basic-auth stance (user fixed to ``elastic`` there;
    configurable here, fixing its TODO at ``traceframe.py:356``).
    """
    import requests

    session = requests.Session()
    if es_password is not None:
        session.auth = (es_user, es_password)
    session.verify = verify

    def search(index: str, body: dict, scroll: str) -> dict:
        resp = session.post(
            f"{es_endpoint}/{index}/_search",
            params={"scroll": scroll},
            json=body,
            timeout=timeout,
        )
        resp.raise_for_status()
        return resp.json()

    def scroll_fn(scroll_id: str, scroll: str) -> dict:
        resp = session.post(
            f"{es_endpoint}/_search/scroll",
            json={"scroll": scroll, "scroll_id": scroll_id},
            timeout=timeout,
        )
        resp.raise_for_status()
        return resp.json()

    return search, scroll_fn


def _search_body(
    service: str | None,
    operation: str | None,
    start: int | None,
    end: int | None,
    mindur: int | None,
    maxdur: int | None,
    limit: int,
) -> dict:
    """ES query body. The reference sends ``match_all`` and rejects every
    filter param as UNIMPLEMENTED (``traceframe.py:338-349``); here they
    become bool-filter clauses so the predicate runs server-side instead
    of shipping every span over the wire."""
    clauses: list[dict] = []
    if service is not None:
        clauses.append({"match": {"process.serviceName": service}})
    if operation is not None:
        clauses.append({"match": {"operationName": operation}})
    time_range: dict[str, int] = {}
    if start is not None:
        time_range["gte"] = start
    if end is not None:
        time_range["lte"] = end
    if time_range:
        clauses.append({"range": {"startTime": time_range}})
    dur_range: dict[str, int] = {}
    if mindur is not None:
        dur_range["gte"] = mindur
    if maxdur is not None:
        dur_range["lte"] = maxdur
    if dur_range:
        clauses.append({"range": {"duration": dur_range}})

    query: dict = (
        {"match_all": {}} if not clauses else {"bool": {"filter": clauses}}
    )
    return {"size": min(MAX_PAGE_SIZE, limit), "query": query}


def internal_spans_from_es(
    es_endpoint: str | None = None,
    es_password: str | None = None,
    prefix: str = "",
    service: str | None = None,
    operation: str | None = None,
    tagexpr: str | None = None,
    start: int | None = None,
    end: int | None = None,
    mindur: int | None = None,
    maxdur: int | None = None,
    limit: int | None = None,
    transport: tuple[SearchFn, ScrollFn] | None = None,
) -> list[dict]:
    """Scroll raw span documents off ES on the driver.

    Reference-parity loop (``traceframe.py:331-402``): page size
    ``min(10000, limit)``, 15 s scroll keepalive, accumulate pages until
    a page is empty or ``limit`` spans have been collected (the final
    page is kept whole, as the reference does — callers that need an
    exact count clip). ``limit`` defaults to 2000 (``traceframe.py:353``).

    Unlike the reference, the filter params are implemented
    (server-side bool filters, :func:`_search_body`). ``tagexpr`` stays
    unsupported — use the engine-side ``search_spans`` /
    ``search_traces`` operators after ingest.
    """
    if tagexpr is not None:
        raise NotImplementedError(
            "tagexpr is not translated to ES DSL; filter after ingest with "
            "traceframe_spark.operators.search"
        )
    if limit is None:
        limit = DEFAULT_LIMIT
    if transport is None:
        if es_endpoint is None:
            raise ValueError("es_endpoint required when no transport is given")
        transport = requests_transport(es_endpoint, es_password)
    search, scroll_fn = transport

    body = _search_body(service, operation, start, end, mindur, maxdur, limit)
    data = search(f"{prefix}jaeger-span-*", body, SCROLL_KEEPALIVE)

    all_spans: list[dict] = []
    scroll_size = len(data["hits"]["hits"])
    scroll_id = data.get("_scroll_id")
    while scroll_size > 0:
        all_spans.extend(hit["_source"] for hit in data["hits"]["hits"])
        if len(all_spans) >= limit:
            break
        data = scroll_fn(scroll_id, SCROLL_KEEPALIVE)
        scroll_id = data.get("_scroll_id")
        scroll_size = len(data["hits"]["hits"])
    return all_spans


def _normalize_es_spans(spans: list[dict]) -> list[dict]:
    """Pin structured ``logs`` entries to JSON text before the schema
    coerces them: StringType accepts any Python object, so a dict log
    would land as its single-quoted ``repr`` — unparseable, and
    different from the identical trace ingested via the HTTP path
    (``jaeger_http._conform_trace`` json.dumps's each log entry)."""
    import json

    out = []
    for s in spans:
        logs = s.get("logs")
        if logs and any(not isinstance(x, str) for x in logs):
            s = dict(s)
            s["logs"] = [x if isinstance(x, str) else json.dumps(x) for x in logs]
        out.append(s)
    return out


def traces_from_es(
    spark: SparkSession,
    es_endpoint: str | None = None,
    es_password: str | None = None,
    prefix: str = "",
    process_name_key: str = "hostname",
    transport: tuple[SearchFn, ScrollFn] | None = None,
    **kwargs: Any,
) -> DataFrame:
    """ES scroll fetch → traces table (reference ``traces_from_es``,
    ``traceframe.py:268-317``).

    The reference's driver-side sort + streaming group-break + pandas
    ``process_traces`` becomes: one ``createDataFrame`` at the ingest
    boundary, :func:`regroup_spans_to_traces` (one shuffle), then the
    native-expression :func:`~traceframe_spark.operators.traces.traces_table`.
    """
    from traceframe_spark.operators.traces import traces_table

    spans = internal_spans_from_es(
        es_endpoint, es_password, prefix, transport=transport, **kwargs
    )
    raw = spark.createDataFrame(_normalize_es_spans(spans), schema=ES_SPAN_SCHEMA)
    return traces_table(regroup_spans_to_traces(raw, process_name_key))


def es_spans_table(
    raw_spans: DataFrame, process_name_key: str = "hostname"
) -> DataFrame:
    """Canonical 12-column span table straight from flat ES span docs.

    The ES document embeds its full ``process`` per span, so the
    Jaeger-file path's map-lookup enrichment is unnecessary — service
    and processID project directly and the whole conversion is ONE
    narrow projection, no regroup shuffle (the regroup is only needed
    when the *traces* table's nested shape is the goal).
    """
    from traceframe_spark.functions import parent_span_id, tags_to_map

    s = F.struct("references")
    # same hostname:serviceName synthesis as regroup_spans_to_traces —
    # the two ES paths must agree on processID for cross-path parity
    host = F.element_at(
        F.map_from_entries(
            F.transform(
                F.col("process.tags"),
                lambda t: F.struct(t["key"].alias("key"), t["value"].alias("value")),
            )
        ),
        process_name_key,
    )
    pid = F.concat_ws(
        ":",
        F.coalesce(host, F.lit("unknown")),
        F.coalesce(F.col("process.serviceName"), F.lit("unknown")),
    )
    # canonical column order (SPAN_FIXED_COLUMNS + tags)
    return raw_spans.select(
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
        parent_span_id(s).alias("parent"),
        tags_to_map(F.col("tags")).alias("tags"),
    )


def spans_from_es_scroll(
    spark: SparkSession,
    es_endpoint: str | None = None,
    es_password: str | None = None,
    prefix: str = "",
    process_name_key: str = "hostname",
    transport: tuple[SearchFn, ScrollFn] | None = None,
    **kwargs: Any,
) -> DataFrame:
    """Driver-side scroll → canonical span table — the working form of
    the reference's declared-but-UNIMPLEMENTED ``spans_from_es``
    (``traceframe.py:320-327`` raises). Shares the fetch loop with
    :func:`traces_from_es`; conversion is :func:`es_spans_table`'s single
    projection."""
    spans = internal_spans_from_es(
        es_endpoint, es_password, prefix, transport=transport, **kwargs
    )
    return es_spans_table(
        spark.createDataFrame(_normalize_es_spans(spans), schema=ES_SPAN_SCHEMA),
        process_name_key,
    )


def spans_from_es(
    spark: SparkSession,
    es_endpoint: str,
    index_prefix: str = "",
    es_user: str | None = None,
    es_password: str | None = None,
    source_format: str = ES_FORMAT,
) -> DataFrame:
    """Flat raw span table from ES via the es-hadoop connector (gated:
    raises with instructions when the connector jar is absent). This is
    the bulk path: the connector maps index shards to input partitions,
    so the scroll runs on executors, not the driver.

    ``source_format`` is the injectable seam (same philosophy as the
    scroll path's ``transport``): tests register a Python DataSource
    under another name to drive the option wiring and load end-to-end
    without the external jar, which this runtime cannot ship."""
    reader = (
        spark.read.format(source_format)
        .option("es.nodes", es_endpoint)
        .option("es.resource", f"{index_prefix}jaeger-span-*")
    )
    if es_user:
        reader = reader.option("es.net.http.auth.user", es_user)
    if es_password:
        reader = reader.option("es.net.http.auth.pass", es_password)
    try:
        return reader.load()
    except Exception as e:
        # only translate the MISSING-CONNECTOR failure; a present jar
        # failing on endpoint/auth/options must surface its real error,
        # not a misdiagnosis pointing at spark.jars.packages
        msg = str(e)
        if "Failed to find data source" in msg or "ClassNotFound" in msg:
            raise NotImplementedError(
                "elasticsearch-spark connector not on the classpath; add the "
                "es-hadoop jar (org.elasticsearch:elasticsearch-spark-30_2.13) "
                "to spark.jars.packages"
            ) from e
        raise


def regroup_spans_to_traces(
    raw_spans: DataFrame, process_name_key: str = "hostname"
) -> DataFrame:
    """Rebuild raw trace documents from a flat ES span table.

    Replaces the reference's driver-side sort + streaming group-break
    (``traceframe.py:277-309``) with one shuffle: group by traceID,
    collect the span list, and aggregate the synthesized process map.
    Output matches RAW_TRACE_SCHEMA's shape so the standard
    spans_table/traces_table operators apply downstream.

    processID synthesis deviates from the reference
    (``traceframe.py:298-301``, hostname tag alone) in two deliberate
    ways:

    - the id is ``<hostname>:<serviceName>`` — two services sharing a
      host would otherwise collapse into ONE map entry (an arbitrary
      collect_set winner), silently attributing one service's spans to
      the other;
    - a span whose process lacks the ``process_name_key`` tag gets
      ``unknown:<serviceName>`` instead of a null id, which would abort
      the whole job with NULL_MAP_KEY (the reference raised a per-row
      KeyError; a distributed rebuild should degrade per span, not die).
    """
    host = F.element_at(
        F.map_from_entries(
            F.transform(
                F.col("process.tags"),
                lambda t: F.struct(t["key"].alias("key"), t["value"].alias("value")),
            )
        ),
        process_name_key,
    )
    pid = F.concat_ws(
        ":",
        F.coalesce(host, F.lit("unknown")),
        F.coalesce(F.col("process.serviceName"), F.lit("unknown")),
    )
    with_pid = raw_spans.withColumn("processID", pid)
    return (
        with_pid.groupBy("traceID")
        .agg(
            F.collect_list(
                F.struct(
                    "traceID",
                    "spanID",
                    "flags",
                    "operationName",
                    "references",
                    "startTime",
                    "duration",
                    "tags",
                    "logs",
                    "processID",
                    F.lit(None).cast("array<string>").alias("warnings"),
                )
            ).alias("spans"),
            F.map_from_entries(
                F.collect_set(F.struct(F.col("processID").alias("key"), F.col("process").alias("value")))
            ).alias("processes"),
        )
        .withColumn("warnings", F.lit(None).cast("array<string>"))
    )
