"""Elasticsearch span source.

The reference scrolls ``jaeger-span-*`` indices through the ES client on
the driver (``/root/reference/traceframe/traceframe.py:268-402``:
scroll pages of min(10000, limit), 15 s keepalive, then a driver-side
sort + group-break to rebuild traces). On Spark the right shape is the
es-hadoop / elasticsearch-spark connector — it partitions the scroll
across executors natively:

    spark.read.format("org.elasticsearch.spark.sql")
         .option("es.nodes", endpoint)
         .option("es.resource", f"{prefix}jaeger-span-*")
         .load()

The connector jar isn't shipped in this runtime, so :func:`spans_from_es`
gates on its presence. The trace-rebuild step the reference does in a
driver loop (``traceframe.py:277-309``) IS shipped here as
:func:`regroup_spans_to_traces` — a pure DataFrame aggregation usable on
any flat span table regardless of where it was read from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ES_FORMAT = "org.elasticsearch.spark.sql"


def spans_from_es(
    spark: SparkSession,
    es_endpoint: str,
    index_prefix: str = "",
    es_user: str | None = None,
    es_password: str | None = None,
) -> DataFrame:
    """Flat raw span table from ES via the es-hadoop connector (gated:
    raises with instructions when the connector jar is absent)."""
    reader = (
        spark.read.format(ES_FORMAT)
        .option("es.nodes", es_endpoint)
        .option("es.resource", f"{index_prefix}jaeger-span-*")
    )
    if es_user:
        reader = reader.option("es.net.http.auth.user", es_user)
    if es_password:
        reader = reader.option("es.net.http.auth.pass", es_password)
    try:
        return reader.load()
    except Exception as e:  # connector jar not on classpath in this runtime
        raise NotImplementedError(
            "elasticsearch-spark connector not on the classpath; add the "
            "es-hadoop jar (org.elasticsearch:elasticsearch-spark-30_2.13) "
            "to spark.jars.packages"
        ) from e


def regroup_spans_to_traces(
    raw_spans: DataFrame, process_name_key: str = "hostname"
) -> DataFrame:
    """Rebuild raw trace documents from a flat ES span table.

    Replaces the reference's driver-side sort + streaming group-break
    (``traceframe.py:277-309``) with one shuffle: group by traceID,
    collect the span list, and aggregate the synthesized process map
    (processID := the process tag named ``process_name_key``, reference
    ``traceframe.py:298-301``). Output matches RAW_TRACE_SCHEMA's shape
    so the standard spans_table/traces_table operators apply downstream.
    """
    pid = F.element_at(
        F.map_from_entries(
            F.transform(
                F.col("process.tags"),
                lambda t: F.struct(t["key"].alias("key"), t["value"].alias("value")),
            )
        ),
        process_name_key,
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
                )
            ).alias("spans"),
            F.map_from_entries(
                F.collect_set(F.struct(F.col("processID").alias("key"), F.col("process").alias("value")))
            ).alias("processes"),
        )
        .withColumn("warnings", F.lit(None).cast("array<string>"))
    )
