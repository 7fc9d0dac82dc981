"""Span table construction: explode + enrich, plus the tag-pivot helper.

Replaces the reference's nested Python loops
(``/root/reference/traceframe/traceframe.py:458-468,485-495``) with one
declarative plan: ``explode(spans)`` → map-lookup service enrichment →
CHILD_OF parent extraction → tag-list→map normalization. All native
Catalyst expressions, no shuffle — the whole thing is a single
narrow-projection stage over the scan.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from traceframe_spark.functions import parent_span_id, service_of, tags_to_map

# Fixed columns of the canonical span table, in reference order
# (the reference's dynamic schema starts with these 11, README.md:44-56).
SPAN_FIXED_COLUMNS = [
    "traceID",
    "spanID",
    "flags",
    "operationName",
    "startTime",
    "duration",
    "logs",
    "processID",
    "warnings",
    "service",
    "parent",
]


def spans_table(raw_traces: DataFrame) -> DataFrame:
    """Raw trace documents → canonical span table (SPAN_SCHEMA).

    One row per span; ``service`` resolved through the trace's process map
    (reference ``traceframe.py:489``), ``parent`` from the first CHILD_OF
    reference (``traceframe.py:429-433``), ``tags`` normalized to
    ``map<string,string>`` instead of pivoted to dynamic columns
    (see :func:`with_tag_columns` for the presentation pivot).
    """
    s = F.col("span")
    return (
        raw_traces.select(
            F.explode("spans").alias("span"),
            F.col("processes"),
        )
        .select(
            s["traceID"].alias("traceID"),
            s["spanID"].alias("spanID"),
            s["flags"].alias("flags"),
            s["operationName"].alias("operationName"),
            s["startTime"].alias("startTime"),
            s["duration"].alias("duration"),
            s["logs"].alias("logs"),
            s["processID"].alias("processID"),
            s["warnings"].alias("warnings"),
            service_of(F.col("processes"), s["processID"]).alias("service"),
            parent_span_id(s).alias("parent"),
            tags_to_map(s["tags"]).alias("tags"),
        )
    )


def distinct_tag_keys(spans: DataFrame) -> list[str]:
    """All tag keys present in the dataset, sorted. One small job."""
    rows = (
        spans.select(F.explode(F.map_keys("tags")).alias("key"))
        .distinct()
        .collect()
    )
    return sorted(r["key"] for r in rows)


# Jaeger tag ``type`` field → Spark cast target. Tag values travel as
# JSON literal text in the canonical map; these casts restore the native
# type the reference's pandas inference produces (traceframe.py:465-467).
JAEGER_TYPE_CASTS = {
    "bool": "boolean",
    "int64": "bigint",
    "float64": "double",
}


def distinct_tag_types(raw_traces: DataFrame) -> dict[str, str]:
    """Tag key → Jaeger ``type`` for every tag in the dataset. One small
    job over the raw trace documents (where the ``type`` field still
    exists — :func:`spans_table` normalizes tags to ``map<string,string>``).
    Keys observed with conflicting types degrade to ``string``."""
    rows = (
        raw_traces.select(F.explode("spans").alias("span"))
        .select(F.explode("span.tags").alias("tag"))
        .groupBy(F.col("tag.key").alias("key"))
        .agg(F.collect_set("tag.type").alias("types"))
        .collect()
    )
    return {
        r["key"]: (r["types"][0] if len(r["types"]) == 1 else "string")
        for r in rows
    }


def with_tag_columns(
    spans: DataFrame,
    keys: Iterable[str] | None = None,
    types: dict[str, str] | None = None,
) -> DataFrame:
    """Presentation pivot: one top-level column per tag key.

    Reproduces the reference's dynamic-width span frame
    (``traceframe.py:465-467``; 71 columns on the test fixture) from the
    canonical MapType form. ``keys=None`` discovers keys with one extra
    job; at scale pass an explicit key list so the plan stays static.

    ``types`` (tag key → Jaeger type, e.g. from :func:`distinct_tag_types`)
    casts each pivoted column to its native type — bool/bigint/double —
    matching the reference frame's dtypes instead of all-string. Values
    that don't parse become null (``try_cast``), mirroring pandas'
    mixed-type fallback rather than failing the job under ANSI.

    A tag key colliding with a fixed span column (an app tagging
    ``service`` or ``parent`` is plausible) pivots as ``tag_<key>`` —
    a raw-key alias would produce two identically named columns, and
    every later ``F.col`` reference would die with AMBIGUOUS_REFERENCE
    (parquet writes reject it outright).
    """
    if keys is None:
        keys = sorted(types) if types is not None else distinct_tag_keys(spans)
    types = types or {}
    fixed = set(SPAN_FIXED_COLUMNS)
    cols = [F.col(c) for c in SPAN_FIXED_COLUMNS]
    for k in keys:
        col = F.col("tags")[k]
        cast_to = JAEGER_TYPE_CASTS.get(types.get(k, "string"))
        if cast_to is not None:
            col = col.try_cast(cast_to)
        cols.append(col.alias(f"tag_{k}" if k in fixed else k))
    return spans.select(*cols)
